"""Relational operator library: pure DataFrame -> DataFrame functions.

Every op is declarative (Catalyst-optimizable); none collect to the
driver. Reference behaviors cited per-function (SURVEY.md §2).
"""
