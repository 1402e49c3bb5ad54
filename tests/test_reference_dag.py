"""Full reference DAG: failure path (run.sh email + retcode), resume
after failure (upstream skipped, failed stage re-run), and the
transmart_loader resource declaration."""

from __future__ import annotations

import pytest

from pmc_conversion_spark.plans.email_report import EmailConfig
from pmc_conversion_spark.plans.incremental import PipelineExit
from pmc_conversion_spark.plans.reference_dag import (build_reference_dag,
                                                      run_reference_pipeline)

LOG = ["===== Luigi Execution Summary =====\n",
       "Scheduled 8 tasks\n",
       "===== Luigi Execution Summary =====\n",
       "ERROR loader blew up\n"]


class RecordingTransport:
    def __init__(self):
        self.sent = []

    def send(self, sender, receivers, payload):
        self.sent.append(payload)


@pytest.mark.slow
def test_failure_sends_email_and_resume_skips_upstream(spark, tmp_path):
    root = str(tmp_path / "dag")
    cfg = EmailConfig(sender="p@x", receivers=["ops@x"], prefix="[CSR]",
                      host="localhost", log_file="pipeline.log")
    transport = RecordingTransport()

    with pytest.raises(PipelineExit) as ei:
        run_reference_pipeline(spark, root=root, email_cfg=cfg,
                               transport=transport, log_lines=LOG,
                               fail_stage="transmart_loader")
    # run.sh semantics: nonzero exit -> report sent, retcode classified
    assert ei.value.retcode == 30
    assert len(transport.sent) == 1
    assert "Subject: [CSR] ERRORS: 1" in transport.sent[0]
    st = dict(ei.value.statuses)
    assert st["csr2transmart"] == "ran"
    assert st["transmart_loader"] == "failed"
    assert st["transmart_api"] == "not_run"
    assert st["git_commit_load_logs"] == "not_run"

    # resume without the fault: completed upstream stages skip (their
    # done-signals match), the failed stage and its downstream run
    statuses, ctx = run_reference_pipeline(spark, root=root)
    st2 = dict(statuses)
    assert st2["update_data_files"] == "skipped"
    assert st2["sources2csr"] == "skipped"
    assert st2["csr2transmart"] == "skipped"
    assert st2["transmart_loader"] == "ran"
    assert st2["git_commit_load_logs"] == "ran"
    assert ctx.counts["loaded_obs"] == 132


def test_loader_declares_transmart_loader_resource(spark, tmp_path):
    tasks, _ = build_reference_dag(spark, root=str(tmp_path / "d"))
    by_name = {t.name: t for t in tasks}
    assert by_name["transmart_loader"].resources == {"transmart_loader": 1}
    assert all(t.resources == {} for n, t in by_name.items()
               if n != "transmart_loader")
