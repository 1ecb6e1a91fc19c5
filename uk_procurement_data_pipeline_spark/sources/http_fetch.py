"""HTTP JSON fetch stage (SURVEY.md §2.1 S4/S5, §2.11 UD1, §2.12 E2).

The reference's only irreducibly-imperative dataflow op is an HTTP GET
with retry inside the per-row loop (2a_extract_contracts_finder.py:32-48,
used at 2a:246): 3 attempts, 2s sleep on read-timeout, ``None`` on
failure — failures become rows with ``status='fetch_failed_or_invalid_
json'`` (2a:248-254), never exceptions.

Spark-first shape: an Arrow-batched ``mapInPandas`` stage so each task
fetches its partition's URIs with connection reuse, emitting
``(uri, payload, status)``. Everything downstream is pure DataFrame
(``from_json`` etc.). The transport is injectable:

* ``requests_transport`` — real HTTP (requires the ``requests`` package;
  import-gated since the engine must run offline);
* ``fake_transport`` — deterministic offline stand-in whose payload is a
  pure function of the URI via md5, so a DuckDB oracle can recompute the
  expected payload fields exactly (tools/oracle_check.py does).

At 100 TB scale the fetch stage parallelizes per-partition with bounded
batches; retry state lives in the worker, no driver round-trips.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

# transport: uri -> response body text (raises on transport error)
Transport = Callable[[str], str]

FETCH_SCHEMA = "uri string, payload string, status string"
STATUS_OK = "ok"
STATUS_FAILED = "fetch_failed_or_invalid_json"

_RETRIES = 3
_RETRY_SLEEP_S = 2.0


def fake_transport(uri: str) -> str:
    """Deterministic offline transport: payload fields derive from md5(uri).

    URIs whose digest starts with hex '0' simulate a network failure
    (1/16 of rows), exercising the retry + status path. The predicate is
    a plain string test so a SQL oracle reproduces it exactly.
    """
    digest = hashlib.md5(uri.encode("utf-8")).hexdigest()
    if digest.startswith("0"):
        raise TimeoutError(f"simulated read timeout for {uri}")
    return json.dumps(
        {
            "uri": uri,
            "ocid": f"ocds-{digest[:12]}",
            "amount": int(digest[12:18], 16),
        },
        separators=(",", ":"),
    )


def requests_transport(timeout_s: float = 30.0) -> Transport:
    """Real HTTP transport (ref 2a:32-48 semantics); offline-gated."""
    import requests  # noqa: PLC0415  (optional dependency, import-gated)

    session = requests.Session()

    def _get(uri: str) -> str:
        resp = session.get(uri, timeout=timeout_s)
        resp.raise_for_status()
        return resp.text

    return _get


def _fetch_one(uri: str, transport: Transport, sleep: Callable[[float], None]) -> tuple[str | None, str]:
    """3-attempt fetch with 2s backoff; (payload, status), never raises."""
    for attempt in range(_RETRIES):
        try:
            body = transport(uri)
            json.loads(body)  # invalid JSON counts as failure (ref 2a:44-46)
            return body, STATUS_OK
        except Exception:  # noqa: BLE001  — ref swallows all fetch errors
            if attempt < _RETRIES - 1:
                sleep(_RETRY_SLEEP_S)
    return None, STATUS_FAILED


def fetch_json_stage(
    uris: DataFrame,
    uri_col: str = "uri",
    transport: Transport | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """mapInPandas fetch stage: one input row -> (uri, payload, status).

    ``transport``/``sleep`` must be picklable (module-level functions);
    they ship to executors inside the closure.
    """
    tp = transport or fake_transport

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {"uri": [], "payload": [], "status": []}
            for uri in pdf[uri_col]:
                payload, status = _fetch_one(uri, tp, sleep)
                out["uri"].append(uri)
                out["payload"].append(payload)
                out["status"].append(status)
            yield pd.DataFrame(out)

    return uris.select(uri_col).mapInPandas(run, schema=FETCH_SCHEMA)
