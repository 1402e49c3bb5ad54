"""INI config loaders for the reference's deployment files.

A user of the reference configures everything through two INI files:
``luigi.cfg`` ([GlobalConfig] paths + study settings, [resources],
[retcode], [TransmartApiTask] endpoints — luigi.cfg-sample:16-60) and
``email_config.cfg`` ([email]/[smtp]/[global] — scripts/
email_client.py:11-27). These loaders turn those exact files into the
engine's dataclasses, so an existing deployment's configs drive
``build_reference_dag`` / ``TransmartPostLoadClient`` /
``EmailConfig`` unchanged.

Inline ``#`` comments are stripped (the sample file carries
``CHANGE ME`` comments on value lines).
"""

from __future__ import annotations

from configparser import ConfigParser
from dataclasses import dataclass, field


def _read_ini(path: str) -> ConfigParser:
    cp = ConfigParser(inline_comment_prefixes=("#", ";"))
    with open(path, encoding="utf-8") as f:
        cp.read_file(f)
    return cp


@dataclass
class GlobalConfig:
    """[GlobalConfig] of luigi.cfg (main.py:57-63 consumes it)."""
    drop_dir: str
    data_repo_dir: str
    working_dir: str
    transformation_config_dir: str
    load_logs_dir_name: str = "load_logs"
    study_id: str = "CSR_STUDY"
    top_node: str = "\\Central Subject Registry\\"
    transmart_copy_jar: str = ""


@dataclass
class ApiTaskConfig:
    """[TransmartApiTask] of luigi.cfg (luigi.cfg-sample:56-60)."""
    keycloak_url: str
    transmart_url: str
    gb_backend_url: str
    client_id: str = "transmart-client"
    offline_token: str = ""


@dataclass
class PipelineConfig:
    global_cfg: GlobalConfig
    api: ApiTaskConfig | None
    resources: dict[str, int] = field(default_factory=dict)
    retcodes: dict[str, int] = field(default_factory=dict)


def load_pipeline_config(path: str) -> PipelineConfig:
    """Parse a luigi.cfg into the engine's pipeline configuration."""
    cp = _read_ini(path)
    g = cp["GlobalConfig"]
    global_cfg = GlobalConfig(
        drop_dir=g["drop_dir"],
        data_repo_dir=g["data_repo_dir"],
        working_dir=g["working_dir"],
        transformation_config_dir=g["transformation_config_dir"],
        load_logs_dir_name=g.get("load_logs_dir_name", "load_logs"),
        study_id=g.get("study_id", "CSR_STUDY"),
        top_node=g.get("top_node", "\\Central Subject Registry\\"),
        transmart_copy_jar=g.get("transmart_copy_jar", ""))
    api = None
    if cp.has_section("TransmartApiTask"):
        a = cp["TransmartApiTask"]
        api = ApiTaskConfig(
            keycloak_url=a.get("keycloak_url", ""),
            transmart_url=a.get("transmart_url", ""),
            gb_backend_url=a.get("gb_backend_url", ""),
            client_id=a.get("client_id", "transmart-client"),
            offline_token=a.get("offline_token", ""))
    resources = {k: int(v) for k, v in cp.items("resources")} \
        if cp.has_section("resources") else {}
    retcodes = {k: int(v) for k, v in cp.items("retcode")} \
        if cp.has_section("retcode") else {}
    return PipelineConfig(global_cfg=global_cfg, api=api,
                          resources=resources, retcodes=retcodes)


def load_email_config(path: str):
    """Parse an email_config.cfg ([email]/[smtp]/[global],
    email_client.py:11-27) into the engine's EmailConfig."""
    from pmc_conversion_spark.plans.email_report import EmailConfig
    cp = _read_ini(path)
    e, s = cp["email"], cp["smtp"]
    return EmailConfig(
        sender=e["sender"],
        receivers=[r.strip() for r in e["receiver"].split(",")],
        prefix=e.get("prefix", ""),
        host=s["host"],
        port=int(s.get("port", "25")),
        username=s.get("username", ""),
        password=s.get("password", ""),
        log_file=cp.get("global", "log_file", fallback=""))
