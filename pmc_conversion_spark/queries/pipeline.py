"""Registry: CSR pipeline composites (SURVEY.md §2, §7.2-7.3).

Filled out alongside pmc_conversion_spark/plans/.
"""
