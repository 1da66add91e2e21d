"""REST fan-out source (SURVEY S1) — token auth + per-entity fetch, Ray-Data-first.

Replays the reference's bronze ingest shape (``bronze_digit.py:28-44`` POST
``gerarToken`` auth, ``:46-109`` per-obra × endpoint GET loop;
``bronze_agilean.py:41-63,114-159``) as an actor-pool ``map_batches`` stage:

- the **transport** (HTTP session) and **token** are acquired ONCE per actor
  in ``__init__`` — never per batch, never per entity;
- the (entity × endpoint) work list is the Dataset axis, so fan-out
  parallelism, backpressure and retries ride the streaming executor;
- per-call retries with bounded backoff (the reference's try/except-per-id,
  ``bronze_digit.py:95-108``, made explicit);
- rows come back stringified + lineage-stamped exactly like the reference's
  bronze normalization (``bronze_digit.py:131-139``).

The container has no network, so the transport is INJECTABLE: production
would pass a factory returning a ``requests.Session``-backed transport; tests
and demos pass :class:`FakeDigitTransport`, a deterministic in-process fake
with the same auth/fetch surface.  The Ray-side plumbing — actor pool,
init-once auth, fan-out axis, retry loop, Arrow output — is real and tested.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import pyarrow as pa

import ray.data


class TransportError(RuntimeError):
    """A fetch failed (after transport-level handling); retried by the actor."""


class FakeDigitTransport:
    """Deterministic stand-in for the reference's digit API (no network).

    ``authenticate`` mints a token (counted, so tests can assert once-per-
    actor); ``get`` returns seeded per-(endpoint, entity) rows and can be
    configured to fail the first call for chosen entities (retry testing).
    """

    def __init__(self, rows_per_entity: int = 3, fail_first_for: tuple = ()):
        self.auth_calls = 0
        self.rows_per_entity = rows_per_entity
        self._fail_once = set(fail_first_for)

    def authenticate(self, user: str = "u", password: str = "p") -> str:
        self.auth_calls += 1
        return f"token-{user}-{self.auth_calls}"

    def get(self, endpoint: str, entity_id: Any, token: str) -> list[dict]:
        if not token:
            raise TransportError("missing token")
        key = (endpoint, entity_id)
        if key in self._fail_once:
            self._fail_once.discard(key)
            raise TransportError(f"transient 5xx for {key}")
        return [
            {
                "entity_id": entity_id,
                "endpoint": endpoint,
                "seq": i,
                "value": f"{endpoint}/{entity_id}/{i}",
            }
            for i in range(self.rows_per_entity)
        ]


class RestFetcher:
    """Actor-pool stage: one transport + one token per ACTOR lifetime."""

    def __init__(
        self,
        transport_factory: Callable[[], Any],
        auth: dict | None = None,
        max_retries: int = 3,
        backoff_sec: float = 0.01,
        lineage: dict | None = None,
    ):
        self.transport = transport_factory()
        self.token = (
            self.transport.authenticate(**(auth or {}))
            if hasattr(self.transport, "authenticate")
            else None
        )
        self.max_retries = max_retries
        self.backoff_sec = backoff_sec
        self.lineage = dict(lineage or {})

    def _fetch(self, endpoint: str, entity_id: Any) -> list[dict]:
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                return self.transport.get(endpoint, entity_id, token=self.token)
            except Exception as e:  # transport decides what is retryable
                last = e
                time.sleep(self.backoff_sec * (2**attempt))
        raise TransportError(f"{endpoint}/{entity_id} failed after retries") from last

    def __call__(self, batch: dict) -> pa.Table:
        rows: list[dict] = []
        for endpoint, entity_id in zip(batch["endpoint"], batch["entity_id"]):
            for r in self._fetch(endpoint, entity_id):
                out = {k: "" if v is None else str(v) for k, v in r.items()}
                out.update(self.lineage)
                rows.append(out)
        if not rows:
            return pa.table({"entity_id": pa.array([], pa.string())})
        return pa.Table.from_pylist(rows)


def read_rest_fanout(
    entity_ids,
    endpoints,
    transport_factory: Callable[[], Any],
    auth: dict | None = None,
    concurrency=(1, 8),
    batch_size: int = 16,
    lineage: dict | None = None,
    max_retries: int = 3,
) -> "ray.data.Dataset":
    """Fan a (entity × endpoint) work list out over a stateful fetch pool.

    Scale shape: the work list is tiny rows (ids), the fetch pool sizes to
    the API's concurrency budget via ``concurrency``/``batch_size`` — at
    cluster scale this is thousands of concurrent sessions with the
    streaming executor applying backpressure to downstream stages.
    """
    items = [
        {"entity_id": str(i), "endpoint": str(e)} for i in entity_ids for e in endpoints
    ]
    return ray.data.from_items(items).map_batches(
        RestFetcher,
        fn_constructor_kwargs={
            "transport_factory": transport_factory,
            "auth": auth,
            "lineage": lineage,
            "max_retries": max_retries,
        },
        batch_size=batch_size,
        batch_format="default",
        concurrency=concurrency,
    )
