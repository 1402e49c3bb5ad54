"""Error-report email boundary — the stage-5 failure path.

Reference: ``scripts/run.sh:7-11`` (ANY nonzero pipeline exit triggers
the report), ``scripts/email_client.py:50-66`` (log parsing), ``:69-83``
(SMTP send with STARTTLS + login), ``:86-101`` (header/body), and
``:117-139`` (orchestration: parse -> count errors into the subject ->
compose -> send).

The log algebra itself is the distributed form already registered as
queries (``slice_between_markers`` / ``filter_log_errors`` /
``agg_count_errors`` over a lines DataFrame); this module owns the
driver-side boundary: composing the bounded message and handing it to an
INJECTABLE transport. No SMTP connection is ever opened by tests — the
transport protocol is the seam, same pattern as ``sleep`` in
``post_load.poll_status``. The real :class:`SmtpTransport` wraps
stdlib ``smtplib`` exactly the way the reference does (STARTTLS, login,
sendmail, quit).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

#: summary-section delimiter in the pipeline log
#: (scripts/email_client.py:55-61)
SUMMARY_MARKER = "Luigi Execution Summary"

#: default body template — same two format holes (+ log pointer) as the
#: reference contract (templates/template_email.txt; email_client.py:101)
DEFAULT_TEMPLATE = """\
Pipeline status: errors were found.

Execution summary
-----------------
{summary}

Error messages
--------------
{errors}

The full log is available at: {log_file}
(error messages above carry their log line numbers)
"""


@dataclass
class EmailConfig:
    """The [email]/[smtp] config sections (email_client.py:11-27)."""
    sender: str
    receivers: list[str]
    prefix: str
    host: str
    port: int = 25
    username: str = ""
    password: str = ""
    template: str = DEFAULT_TEMPLATE
    log_file: str = ""


def parse_log(lines: Sequence[str]) -> tuple[list[str], list[str]]:
    """Split a pipeline log into (summary_lines, error_lines).

    Summary = lines strictly between the first and last occurrence of
    the summary marker; errors = ERROR lines that are not
    luigi-interface chatter, each prefixed with its line number
    (email_client.py:50-66). This is the driver-side twin of the
    registered ``slice_between_markers`` / ``filter_log_errors``
    queries — the log that feeds an email is bounded by construction.
    """
    marker_idx = [i for i, line in enumerate(lines) if SUMMARY_MARKER in line]
    summary: list[str] = []
    if len(marker_idx) >= 2:
        summary = [line.rstrip("\n")
                   for line in lines[marker_idx[0] + 1:marker_idx[-1]]]
    errors = [f"Line: {i} | {line.rstrip()}"
              for i, line in enumerate(lines)
              if "ERROR" in line and "luigi-interface" not in line]
    return summary, errors


def compose_report(cfg: EmailConfig,
                   summary: Sequence[str],
                   errors: Sequence[str]) -> tuple[str, str]:
    """(subject, body): subject carries the error count
    (email_client.py:131), body fills the template holes."""
    subject = f"{cfg.prefix} ERRORS: {len(errors)}"
    body = cfg.template.format(summary="\n".join(summary),
                               errors="\n".join(errors),
                               log_file=cfg.log_file)
    return subject, body


def build_payload(cfg: EmailConfig, subject: str, body: str) -> str:
    """RFC-822-ish header + body (email_client.py:86-94)."""
    header = "\n".join([f"From: {cfg.sender}",
                        f"To: {', '.join(cfg.receivers)}",
                        f"Subject: {subject}\n\n"])
    return header + body


class SmtpTransport:
    """Real SMTP send: STARTTLS + login + sendmail + quit
    (email_client.py:69-83). Constructed lazily so importing this
    module never touches the network."""

    def __init__(self, host: str, port: int = 25,
                 username: str = "", password: str = ""):
        self.host = host
        self.port = port
        self.username = username
        self.password = password

    def send(self, sender: str, receivers: Sequence[str],
             payload: str) -> None:
        import smtplib
        server = smtplib.SMTP(self.host, self.port)
        try:
            server.starttls()
            if self.username:
                server.login(self.username, self.password)
            server.sendmail(sender, list(receivers), payload)
        finally:
            server.quit()


#: transport seam: anything with .send(sender, receivers, payload)
Transport = object


def send_error_report(cfg: EmailConfig, transport,
                      log_lines: Sequence[str] | None = None) -> str:
    """Parse -> compose -> send through ``transport``; returns the
    payload that was sent (for logging/testing)."""
    if log_lines is None:
        with open(cfg.log_file) as fh:
            log_lines = fh.readlines()
    summary, errors = parse_log(log_lines)
    subject, body = compose_report(cfg, summary, errors)
    payload = build_payload(cfg, subject, body)
    transport.send(cfg.sender, cfg.receivers, payload)
    return payload


def run_with_error_report(pipeline: Callable[[], object],
                          cfg: EmailConfig, transport,
                          log_lines: Sequence[str] | None = None):
    """``run.sh`` semantics: run the pipeline; on ANY failure compose
    and send the error report, then re-raise the original error. On
    success no email is sent."""
    try:
        return pipeline()
    except BaseException:
        send_error_report(cfg, transport, log_lines)
        raise
