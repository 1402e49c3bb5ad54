"""Post-load hooks: the stage-5 REST boundary (driver-side, not data).

Reference: ``scripts/transmart_api_calls.py`` — Keycloak offline-token
exchange (:30-54), cache rebuild / clear / after-data-loading /
subscription-scan calls (:56-93), async status polling every
``interval`` seconds up to ``max_retries`` times until a terminal
state (:95-113); ``luigi-pipeline/main.py:158`` sets the 240×30 s
budget. REST calls stay driver-side in the Spark engine too
(SURVEY §3.1 boundary mapping); the HTTP client is INJECTED so no test
or offline run ever opens a socket — the seam is
``http(method, url, headers=..., params=...)``.
"""

from __future__ import annotations

import time
from collections.abc import Callable

TERMINAL_STATES = ("COMPLETED", "FAILED")


class StatusPollTimeout(TimeoutError):
    pass


class TransmartApiError(RuntimeError):
    """Any post-load REST failure (transmart_api_calls.py:6-7)."""


class TransmartPostLoadClient:
    """Stage-5 REST surface with an injectable HTTP callable.

    ``http(method, url, headers=dict, params=dict) -> response`` where
    the response exposes ``ok``, ``json()`` and (optionally)
    ``status_code`` — the subset of ``requests.Response`` the
    reference uses. Pass ``http=requests.request`` in production.
    """

    def __init__(self, *, keycloak_url: str, transmart_url: str,
                 gb_backend_url: str, client_id: str, offline_token: str,
                 http: Callable, sleep: Callable[[float], None] = time.sleep):
        self.keycloak_url = keycloak_url.rstrip("/")
        self.transmart_url = transmart_url.rstrip("/")
        self.gb_backend_url = gb_backend_url.rstrip("/")
        self.client_id = client_id
        self.offline_token = offline_token
        self.http = http
        self.sleep = sleep
        self._token: str | None = None

    # -- Keycloak (transmart_api_calls.py:20-54) ----------------------

    def get_token(self) -> str:
        """Cached access token; fetched once per client lifetime."""
        if self._token is None:
            self._token = self.retrieve_token()
        return self._token

    def retrieve_token(self) -> str:
        url = f"{self.keycloak_url}/protocol/openid-connect/token"
        try:
            resp = self.http(
                "POST", url,
                headers={"Accept": "application/json"},
                params={"grant_type": "refresh_token",
                        "scope": "offline_access",
                        "client_id": self.client_id,
                        "refresh_token": self.offline_token})
            if not resp.ok:
                raise TransmartApiError(
                    f"token endpoint returned {resp.status_code}")
            return resp.json()["access_token"]
        except TransmartApiError:
            raise
        except Exception as e:
            raise TransmartApiError(
                f"could not retrieve access token from {url}: {e}") from e

    # -- authorized calls (transmart_api_calls.py:115-159) ------------

    def _call(self, method: str, path: str, *, server_url: str | None = None):
        url = (server_url or self.transmart_url) + path
        headers = {"Accept": "application/json",
                   "Authorization": f"Bearer {self.get_token()}"}
        try:
            resp = self.http(method, url, headers=headers, params=None)
        except Exception as e:
            raise TransmartApiError(f"{method} {url} failed: {e}") from e
        if not resp.ok:
            raise TransmartApiError(
                f"{method} {url} returned {resp.status_code}")
        return resp

    # -- the stage-5 verbs (transmart_api_calls.py:56-93) -------------

    def clear_tree_nodes_cache(self) -> None:
        self._call("GET", "/v2/tree_nodes/clear_cache")

    def rebuild_tree_cache(self) -> None:
        self._call("GET", "/v2/tree_nodes/rebuild_cache")

    def after_data_loading(self) -> None:
        self._call("GET", "/v2/admin/system/after_data_loading_update")

    def scan_subscription_queries(self) -> None:
        self._call("POST", "/queries/sets/scan",
                   server_url=self.gb_backend_url)

    def update_status(self) -> dict:
        return self._call(
            "GET", "/v2/admin/system/update_status").json()

    # -- async status budget (transmart_api_calls.py:95-113) ----------

    def check_status(self, *, max_retries: int = 240,
                     interval_s: float = 30.0) -> str:
        """Poll ``update_status`` until COMPLETED (returns), FAILED
        (raises with the server's message), or the 240×30 s budget is
        spent (raises StatusPollTimeout)."""
        def fetch() -> str:
            st = self.update_status()
            if st.get("status") == "FAILED":
                raise TransmartApiError(
                    "after-data-loading update failed: "
                    f"{st.get('message')}")
            return st.get("status", "")

        return poll_status(fetch, max_retries=max_retries,
                           interval_s=interval_s, sleep=self.sleep)

    def run_post_load(self, *, max_retries: int = 240,
                      interval_s: float = 30.0) -> str:
        """The whole stage-5 sequence (luigi-pipeline/main.py:150-174):
        kick the after-data-loading update, wait for it to complete,
        then scan query subscriptions. Returns the terminal status."""
        self.after_data_loading()
        status = self.check_status(max_retries=max_retries,
                                   interval_s=interval_s)
        self.scan_subscription_queries()
        return status


def poll_status(fetch: Callable[[], str], *, max_retries: int = 240,
                interval_s: float = 30.0,
                sleep: Callable[[float], None] = time.sleep) -> str:
    """Poll ``fetch()`` until a terminal state or the retry budget is
    spent (then raises StatusPollTimeout). ``sleep`` injectable for
    tests."""
    for attempt in range(max_retries):
        status = fetch()
        if status in TERMINAL_STATES:
            return status
        if attempt < max_retries - 1:
            sleep(interval_s)
    raise StatusPollTimeout(
        f"status not terminal after {max_retries} polls")


def final_status_per_job(status_events):
    """Batch form over a status-event log DataFrame (job_id, seq,
    status): the job's outcome is its first terminal status by seq, else
    'TIMEOUT' — the declarative twin of the polling loop."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    terminal = status_events.filter(F.col("status").isin(*TERMINAL_STATES))
    w = Window.partitionBy("job_id").orderBy("seq")
    first_terminal = (terminal
                      .withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") == 1)
                      .select("job_id", F.col("status").alias("final_status")))
    all_jobs = status_events.select("job_id").distinct()
    return (all_jobs.join(first_terminal, "job_id", "left")
            .select("job_id",
                    F.coalesce("final_status", F.lit("TIMEOUT"))
                    .alias("final_status")))
