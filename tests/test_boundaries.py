"""Stage-5 boundary adapters: error-report email, post-load REST
client, and the DagRunner policy knobs (retries, retcodes, resource
caps). All seams are injected — no SMTP/HTTP socket and no Spark job
is involved; mirrors the reference's test style for its error paths
(tests/test_sync.py)."""

from __future__ import annotations

import threading
import time

import pytest

from pmc_conversion_spark.plans import email_report as ER
from pmc_conversion_spark.plans.incremental import (MissingDataError,
                                                    PipelineExit, RETCODES,
                                                    ResourcePool)
from pmc_conversion_spark.plans.post_load import (StatusPollTimeout,
                                                  TransmartApiError,
                                                  TransmartPostLoadClient)

LOG = [
    "2024-01-01 INFO start\n",
    "2024-01-01 ERROR something broke\n",
    "===== Luigi Execution Summary =====\n",
    "Scheduled 4 tasks\n",
    "* 3 ran successfully\n",
    "===== Luigi Execution Summary =====\n",
    "2024-01-01 ERROR luigi-interface retry chatter\n",
    "2024-01-01 ERROR second real failure\n",
]


class RecordingTransport:
    def __init__(self):
        self.sent = []

    def send(self, sender, receivers, payload):
        self.sent.append((sender, list(receivers), payload))


@pytest.fixture()
def email_cfg():
    return ER.EmailConfig(sender="pipeline@example.org",
                          receivers=["ops@example.org", "dev@example.org"],
                          prefix="[CSR]", host="localhost",
                          log_file="/var/log/pipeline.log")


# ------------------------------------------------------------- email

def test_parse_log_summary_and_errors():
    summary, errors = ER.parse_log(LOG)
    assert summary == ["Scheduled 4 tasks", "* 3 ran successfully"]
    # luigi-interface chatter excluded; line numbers preserved
    assert len(errors) == 2
    assert errors[0].startswith("Line: 1 |")
    assert "second real failure" in errors[1]


def test_compose_report_subject_counts_errors(email_cfg):
    summary, errors = ER.parse_log(LOG)
    subject, body = ER.compose_report(email_cfg, summary, errors)
    assert subject == "[CSR] ERRORS: 2"
    assert "Scheduled 4 tasks" in body
    assert "/var/log/pipeline.log" in body


def test_run_with_error_report_sends_on_failure(email_cfg):
    transport = RecordingTransport()

    def boom():
        raise RuntimeError("stage 3 exploded")

    with pytest.raises(RuntimeError, match="stage 3 exploded"):
        ER.run_with_error_report(boom, email_cfg, transport, log_lines=LOG)
    assert len(transport.sent) == 1
    sender, receivers, payload = transport.sent[0]
    assert sender == "pipeline@example.org"
    assert receivers == ["ops@example.org", "dev@example.org"]
    assert "Subject: [CSR] ERRORS: 2" in payload
    assert "second real failure" in payload


def test_run_with_error_report_silent_on_success(email_cfg):
    transport = RecordingTransport()
    assert ER.run_with_error_report(lambda: 42, email_cfg, transport,
                                    log_lines=LOG) == 42
    assert transport.sent == []


# --------------------------------------------------------------- REST

class FakeResponse:
    def __init__(self, payload=None, ok=True, status_code=200):
        self._payload = payload or {}
        self.ok = ok
        self.status_code = status_code

    def json(self):
        return self._payload


class FakeHttp:
    """Scripted injectable http(method, url, headers, params)."""

    def __init__(self, statuses=()):
        self.calls = []
        self.statuses = list(statuses)

    def __call__(self, method, url, headers=None, params=None):
        self.calls.append((method, url, headers, params))
        if url.endswith("/protocol/openid-connect/token"):
            return FakeResponse({"access_token": "tok-123"})
        if url.endswith("/update_status"):
            st = self.statuses.pop(0) if self.statuses else "COMPLETED"
            return FakeResponse({"status": st, "message": "boom"})
        return FakeResponse({})


def make_client(http, sleeps=None):
    return TransmartPostLoadClient(
        keycloak_url="https://kc.example.org/realms/r",
        transmart_url="http://tm.example.org",
        gb_backend_url="http://gb.example.org",
        client_id="cli", offline_token="off-tok", http=http,
        sleep=(sleeps.append if sleeps is not None else (lambda s: None)))


def test_token_fetched_once_and_bearer_applied():
    http = FakeHttp()
    c = make_client(http)
    c.clear_tree_nodes_cache()
    c.rebuild_tree_cache()
    token_calls = [u for _, u, _, _ in http.calls if "token" in u]
    assert len(token_calls) == 1  # cached across calls
    method, url, headers, _ = http.calls[-1]
    assert (method, url) == ("GET",
                             "http://tm.example.org/v2/tree_nodes/rebuild_cache")
    assert headers["Authorization"] == "Bearer tok-123"


def test_token_refresh_request_shape():
    http = FakeHttp()
    make_client(http).get_token()
    method, url, headers, params = http.calls[0]
    assert method == "POST"
    assert url == ("https://kc.example.org/realms/r"
                   "/protocol/openid-connect/token")
    assert params["grant_type"] == "refresh_token"
    assert params["refresh_token"] == "off-tok"
    assert params["scope"] == "offline_access"


def test_scan_subscriptions_hits_gb_backend():
    http = FakeHttp()
    make_client(http).scan_subscription_queries()
    method, url, _, _ = http.calls[-1]
    assert (method, url) == ("POST", "http://gb.example.org/queries/sets/scan")


def test_check_status_polls_until_completed():
    sleeps = []
    http = FakeHttp(statuses=["RUNNING", "RUNNING", "COMPLETED"])
    st = make_client(http, sleeps).check_status(max_retries=5, interval_s=30)
    assert st == "COMPLETED"
    assert sleeps == [30, 30]  # slept only between non-terminal polls


def test_check_status_failed_raises_with_message():
    http = FakeHttp(statuses=["RUNNING", "FAILED"])
    with pytest.raises(TransmartApiError, match="boom"):
        make_client(http).check_status(max_retries=5, interval_s=30)


def test_check_status_budget_exhausted():
    http = FakeHttp(statuses=["RUNNING"] * 10)
    with pytest.raises(StatusPollTimeout):
        make_client(http).check_status(max_retries=3, interval_s=30)


def test_http_error_classified():
    def bad_http(method, url, headers=None, params=None):
        return FakeResponse(ok=False, status_code=503)
    with pytest.raises(TransmartApiError, match="503"):
        make_client(bad_http).get_token()


def test_run_post_load_sequence():
    http = FakeHttp(statuses=["RUNNING", "COMPLETED"])
    assert make_client(http).run_post_load(max_retries=5,
                                           interval_s=30) == "COMPLETED"
    paths = [u.split(".org", 1)[1] for _, u, _, _ in http.calls]
    assert paths.index("/v2/admin/system/after_data_loading_update") \
        < paths.index("/queries/sets/scan")


# --------------------------------------------- DagRunner policy knobs

def _dag_runner(tmp_path, spark, resources=None):
    from pmc_conversion_spark.plans.incremental import DagRunner, SignalStore
    return DagRunner(spark, SignalStore(str(tmp_path / "signals")),
                     resources=resources)


def _task(name, run, requires=(), retries=0, resources=None, tmp_path=None):
    from pmc_conversion_spark.plans.incremental import Task
    return Task(name=name, input_dirs=[], run=run,
                required_tasks=list(requires), retries=retries,
                resources=resources or {})


def test_retry_budget_transient_then_success(tmp_path, spark):
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")

    runner = _dag_runner(tmp_path, spark)
    statuses = runner.run_pipeline([_task("flaky", flaky, retries=2)])
    assert statuses == [("flaky", "ran")]
    assert len(attempts) == 3


def test_retry_budget_exhausted_classified_and_downstream_not_run(
        tmp_path, spark):
    attempts = []

    def always_fails():
        attempts.append(1)
        raise RuntimeError("permanent")

    t1 = _task("load", always_fails, retries=1)
    t2 = _task("post_load", lambda: None, requires=[t1])
    runner = _dag_runner(tmp_path, spark)
    with pytest.raises(PipelineExit) as ei:
        runner.run_pipeline([t1, t2])
    assert len(attempts) == 2                    # 1 try + 1 retry
    assert ei.value.retclass == "task_failed"
    assert ei.value.retcode == RETCODES["task_failed"] == 30
    assert ("load", "failed") in ei.value.statuses
    assert ("post_load", "not_run") in ei.value.statuses


def test_missing_data_retcode(tmp_path, spark):
    def missing():
        raise MissingDataError("dropzone empty")

    runner = _dag_runner(tmp_path, spark)
    with pytest.raises(PipelineExit) as ei:
        runner.run_pipeline([_task("sync", missing)])
    assert ei.value.retcode == 20


def test_resource_cap_serializes_sinks(tmp_path, spark):
    """Two independent load tasks declaring transmart_loader=1 must
    never overlap, however many workers the scheduler has — the
    [resources] semantics of luigi.cfg-sample:42-43."""
    intervals = {}

    def load(name):
        def run():
            start = time.monotonic()
            time.sleep(0.15)
            intervals[name] = (start, time.monotonic())
        return run

    t1 = _task("load_a", load("a"), resources={"transmart_loader": 1})
    t2 = _task("load_b", load("b"), resources={"transmart_loader": 1})
    runner = _dag_runner(tmp_path, spark,
                         resources={"transmart_loader": 1})
    statuses = runner.run_pipeline([t1, t2], max_workers=4)
    assert sorted(statuses) == [("load_a", "ran"), ("load_b", "ran")]
    (a0, a1), (b0, b1) = intervals["a"], intervals["b"]
    assert a1 <= b0 or b1 <= a0  # disjoint execution windows


def test_uncapped_independent_tasks_do_overlap(tmp_path, spark):
    """Sanity check that the serialization above is the resource cap,
    not an accident of the executor: two uncapped tasks meet at a
    barrier, which only resolves if they run concurrently."""
    barrier = threading.Barrier(2, timeout=10)

    def meet():
        barrier.wait()

    t1 = _task("a", meet)
    t2 = _task("b", meet)
    runner = _dag_runner(tmp_path, spark)
    statuses = runner.run_pipeline([t1, t2], max_workers=2)
    assert sorted(statuses) == [("a", "ran"), ("b", "ran")]


def test_resource_pool_counts():
    pool = ResourcePool({"r": 2})
    pool.acquire({"r": 1})
    pool.acquire({"r": 1})
    done = []
    t = threading.Thread(target=lambda: (pool.acquire({"r": 1}),
                                         done.append(1)))
    t.start()
    time.sleep(0.1)
    assert not done          # both slots taken -> third acquire blocks
    pool.release({"r": 1})
    t.join(timeout=5)
    assert done


def test_cycle_is_scheduling_error(tmp_path, spark):
    a = _task("a", lambda: None)
    b = _task("b", lambda: None, requires=[a])
    a.required_tasks = [b]
    runner = _dag_runner(tmp_path, spark)
    with pytest.raises(PipelineExit) as ei:
        runner.run_pipeline([a, b])
    assert ei.value.retcode == 35


# ------------------------------------------------ INI config loaders

LUIGI_CFG = """\
[core]
logging_conf_file=logging.cfg

[GlobalConfig]
drop_dir=/data/drop_zone
data_repo_dir=/data/repo
working_dir=/data/work
transformation_config_dir=/data/config
load_logs_dir_name=load_logs
transmart_copy_jar=/libs/transmart-copy.jar  # CHANGE ME
study_id=CSR_STUDY
top_node=\\Central Subject Registry\\

[resources]
transmart_loader=1

[retcode]
already_running=10
missing_data=20
not_run=25
task_failed=30
scheduling_error=35
unhandled_exception=40

[TransmartApiTask]
keycloak_url=https://kc.example.org/realms/example  # CHANGE ME
transmart_url=http://localhost:8081
gb_backend_url=http://localhost:8083
client_id=transmart-client
offline_token=secret-token
"""

EMAIL_CFG = """\
[email]
receiver=ops@example.org, dev@example.org
sender=pipeline@example.org
prefix=[CSR]

[smtp]
host=smtp.example.org
port=587
username=pipeline
password=hunter2

[global]
log_file=/var/log/pipeline.log
"""


def test_load_pipeline_config_sample_shape(tmp_path):
    from pmc_conversion_spark.plans.incremental import RETCODES
    from pmc_conversion_spark.plans.pipeline_config import \
        load_pipeline_config
    p = tmp_path / "luigi.cfg"
    p.write_text(LUIGI_CFG)
    cfg = load_pipeline_config(str(p))
    assert cfg.global_cfg.drop_dir == "/data/drop_zone"
    assert cfg.global_cfg.study_id == "CSR_STUDY"
    # inline CHANGE-ME comments must be stripped
    assert cfg.global_cfg.transmart_copy_jar == "/libs/transmart-copy.jar"
    assert cfg.api.keycloak_url == "https://kc.example.org/realms/example"
    assert cfg.api.offline_token == "secret-token"
    assert cfg.resources == {"transmart_loader": 1}
    assert cfg.retcodes == RETCODES  # the sample IS our class table


LOGGING_CFG = """\
[loggers]
keys=root

[handlers]
keys=consoleHandler,fileHandler

[formatters]
keys=consoleFormatter,fileFormatter

[logger_root]
level=NOTSET
handlers=consoleHandler,fileHandler

[handler_consoleHandler]
class=StreamHandler
level=INFO
formatter=consoleFormatter
args=(sys.stdout,)

[handler_fileHandler]
class=FileHandler
level=DEBUG
formatter=fileFormatter
args=('python.log','w')

[formatter_consoleFormatter]
format=%(asctime)s; %(levelname)-7s %(name)-25s - %(message)s
datefmt=%Y-%m-%d %H:%M:%S

[formatter_fileFormatter]
format=%(asctime)s  %(levelname)-7s %(name)-25s %(message)s
datefmt=%Y-%m-%d %H:%M:%S
"""


def test_load_logging_config(tmp_path):
    """logging.cfg (the last reference deployment file): the stdlib
    fileConfig schema parses into typed handlers/formatters and the
    root fan-out, and applying it actually reconfigures stdlib
    logging the way the reference's startup does."""
    import logging
    from pmc_conversion_spark.plans.pipeline_config import \
        load_logging_config
    p = tmp_path / "logging.cfg"
    # the reference writes its file log next to the cwd; point the
    # fixture's FileHandler into tmp_path so apply() is hermetic
    p.write_text(LOGGING_CFG.replace(
        "'python.log'", repr(str(tmp_path / "python.log"))))
    cfg = load_logging_config(str(p))
    assert cfg.root_level == "NOTSET"
    assert cfg.root_handlers == ["consoleHandler", "fileHandler"]
    assert cfg.handlers["consoleHandler"].cls == "StreamHandler"
    assert cfg.handlers["consoleHandler"].level == "INFO"
    assert cfg.handlers["fileHandler"].level == "DEBUG"
    assert cfg.formatters["fileFormatter"].datefmt == "%Y-%m-%d %H:%M:%S"
    assert "%(levelname)-7s" in cfg.formatters["consoleFormatter"].format
    prev = logging.getLogger().handlers[:]
    try:
        cfg.apply()
        root = logging.getLogger()
        kinds = {type(h).__name__ for h in root.handlers}
        assert {"StreamHandler", "FileHandler"} <= kinds
    finally:
        logging.getLogger().handlers[:] = prev


def test_load_email_config(tmp_path):
    from pmc_conversion_spark.plans.pipeline_config import load_email_config
    p = tmp_path / "email_config.cfg"
    p.write_text(EMAIL_CFG)
    cfg = load_email_config(str(p))
    assert cfg.receivers == ["ops@example.org", "dev@example.org"]
    assert (cfg.host, cfg.port) == ("smtp.example.org", 587)
    assert cfg.log_file == "/var/log/pipeline.log"
    # composing with the parsed config works end-to-end
    from pmc_conversion_spark.plans.email_report import compose_report
    subject, _ = compose_report(cfg, ["s"], ["e1", "e2"])
    assert subject == "[CSR] ERRORS: 2"
