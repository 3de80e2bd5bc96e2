"""Resilient backend wrapper: response cache, retries, rate limiting,
call accounting.

The reference funnels every model call through ``APIWrapper.call_llm``
(/root/reference/docetl/operations/utils/api.py:588-734), which layers:

- a disk cache keyed on (model, op_type, messages, schema, ...)
  (api.py:649-657; operations/utils/cache.py:17-23),
- retries on rate-limit/timeout errors (default 120 s timeout, 2
  retries — map.py:476-477),
- pyrate_limiter token buckets (docetl/ratelimiter.py;
  runner.py:297-300, blocking_acquire runner.py:345-361),
- per-call cost accounting surfaced to the runner.

On Spark the model call happens inside Arrow-batched UDFs on executors,
so each concern becomes executor-local: the cache and the token bucket
live in module-level process state (one per Python worker), and
accounting flows back to the driver through Spark accumulators. A
cluster-wide request budget is divided statically: give each executor
``rpm / num_executors`` (the wrapper takes the per-process rpm).

``ResilientBackend`` wraps any :class:`~docetl_spark.backend.ModelBackend`
transparently, so every semantic operator gains these behaviors without
code changes — pass ``ResilientBackend(inner)`` wherever a backend goes.
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
from collections import OrderedDict
from typing import Any

from .backend import ModelBackend

# Process-level state, keyed by namespace: shared by every task in a
# Python worker so cache hits and rate limits span concurrent partitions.
_caches: dict[str, OrderedDict] = {}
_buckets: dict[str, "_TokenBucket"] = {}
_state_lock = threading.Lock()


class _TokenBucket:
    """Minimal thread-safe token bucket (pyrate_limiter analogue,
    docetl/ratelimiter.py). ``acquire`` blocks until a token is free —
    mirroring the reference's blocking_acquire (runner.py:345-361)."""

    def __init__(self, rate_per_s: float, capacity: float | None = None):
        self.rate = float(rate_per_s)
        self.capacity = capacity if capacity is not None else max(1.0, self.rate)
        self.tokens = self.capacity
        self.ts = time.monotonic()
        self.lock = threading.Lock()

    def acquire(self) -> float:
        waited = 0.0
        while True:
            with self.lock:
                now = time.monotonic()
                self.tokens = min(self.capacity, self.tokens + (now - self.ts) * self.rate)
                self.ts = now
                if self.tokens >= 1.0:
                    self.tokens -= 1.0
                    return waited
                need = (1.0 - self.tokens) / self.rate
            time.sleep(need)
            waited += need


class BackendMetrics:
    """Driver-side accumulators for executor-side call accounting.

    Build on the driver (needs the SparkContext), pass into
    :class:`ResilientBackend`; readable on the driver after an action.
    The reference tracks per-call cost on its single process
    (api.py:588-734) — accumulators are the Spark-native equivalent.
    """

    def __init__(self, sc):
        self.calls = sc.accumulator(0)
        self.cache_hits = sc.accumulator(0)
        self.retries = sc.accumulator(0)
        self.rate_waits = sc.accumulator(0)
        # token accounting: exact when the inner backend reports usage
        # (litellm-style), else the chars/4 estimate; cache hits are free
        self.prompt_tokens = sc.accumulator(0)
        self.completion_tokens = sc.accumulator(0)

    def snapshot(self) -> dict:
        return {
            "calls": self.calls.value,
            "cache_hits": self.cache_hits.value,
            "retries": self.retries.value,
            "rate_waits": self.rate_waits.value,
            "prompt_tokens": self.prompt_tokens.value,
            "completion_tokens": self.completion_tokens.value,
        }


def _stable_key(*parts: Any) -> str:
    blob = json.dumps(parts, sort_keys=True, default=str, separators=(",", ":"))
    return hashlib.sha256(blob.encode()).hexdigest()


class ResilientBackend(ModelBackend):
    """Wrap ``inner`` with cache + retry + rate limit + accounting.

    Parameters mirror the reference's knobs:

    - ``max_retries`` / ``backoff_s``: retry transient failures
      (``retry_on`` exception types) with exponential backoff
      (map.py:476-477 defaults: 2 retries).
    - ``rate_limit_rpm``: per-process requests/minute; ``None`` = off.
    - ``cache_size``: LRU entries per process; 0 disables. Keys include
      prompt, schema and row context, like the reference's cache key
      (api.py:649-657). ``bypass_cache`` skips lookup but still stores.
    - ``cache_dir``: optional PERSISTENT cache directory (the
      reference's diskcache, cache.py:17-23 — survives across runs and
      processes). Layered under the LRU: miss memory -> read disk ->
      call; results are written through as atomic JSON files sharded by
      key prefix. On a cluster, point it at storage all executors share
      (NFS / fuse-mounted object store); entries are content-addressed
      so concurrent writers are idempotent. Non-JSON-serializable
      results skip the disk layer silently.
    - ``namespace``: isolates cache/bucket state between pipelines.
    - ``metrics``: optional :class:`BackendMetrics`.

    Embeddings are cached per *text*, so re-embedding a corpus where only
    some rows changed (resolve → rank → cluster chains) only pays for the
    misses — the reference gets this from its disk cache.
    """

    def __init__(
        self,
        inner: ModelBackend,
        *,
        namespace: str = "default",
        max_retries: int = 2,
        backoff_s: float = 0.2,
        rate_limit_rpm: float | None = None,
        cache_size: int = 50_000,
        cache_dir: str | None = None,
        bypass_cache: bool = False,
        retry_on: tuple = (TimeoutError, ConnectionError, OSError),
        metrics: BackendMetrics | None = None,
    ):
        self.inner = inner
        self.namespace = namespace
        self.max_retries = int(max_retries)
        self.backoff_s = float(backoff_s)
        self.rate_limit_rpm = rate_limit_rpm
        self.cache_size = int(cache_size)
        self.cache_dir = cache_dir
        self.bypass_cache = bypass_cache
        self.retry_on = retry_on
        self.metrics = metrics
        # inherit the wrapped backend's declared call concurrency
        self.max_concurrency = getattr(inner, "max_concurrency", 1)
        # fold the inner backend's model identity into every cache key:
        # with per-op model overrides (with_options), the same prompt
        # against different models must never share a cached response
        self._model_token = str(getattr(inner, "model", ""))

    def with_options(self, **opts) -> "ResilientBackend":
        """Per-op overrides pass through to the wrapped backend; the
        wrapper's cache/retry/metrics settings are preserved — except
        ``max_retries_per_timeout`` (the reference's per-op retry budget,
        base.py:105), which reconfigures THIS layer's retry count. Same
        object when nothing changes (FakeBackend etc.)."""
        retries = opts.pop("max_retries_per_timeout", None)
        new_inner = self.inner.with_options(**opts)
        if new_inner is self.inner and retries is None:
            return self
        return ResilientBackend(
            new_inner, namespace=self.namespace,
            max_retries=self.max_retries if retries is None else int(retries),
            backoff_s=self.backoff_s, rate_limit_rpm=self.rate_limit_rpm,
            cache_size=self.cache_size, cache_dir=self.cache_dir,
            bypass_cache=self.bypass_cache, retry_on=self.retry_on,
            metrics=self.metrics,
        )

    # -- process-local state ------------------------------------------
    def _cache(self) -> OrderedDict:
        with _state_lock:
            return _caches.setdefault(self.namespace, OrderedDict())

    def _bucket(self) -> _TokenBucket | None:
        if not self.rate_limit_rpm:
            return None
        with _state_lock:
            b = _buckets.get(self.namespace)
            if b is None:
                b = _buckets[self.namespace] = _TokenBucket(self.rate_limit_rpm / 60.0)
            return b

    # -- persistent layer ---------------------------------------------
    def _disk_path(self, key: str) -> str:
        import os

        return os.path.join(self.cache_dir, key[:2], f"{key}.json")

    def _disk_get(self, key: str):
        if not self.cache_dir:
            return None
        try:
            with open(self._disk_path(key)) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _disk_put(self, key: str, value) -> None:
        if not self.cache_dir:
            return
        import os
        import tempfile

        path = self._disk_path(key)
        try:
            blob = json.dumps(value)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # atomic write: concurrent executors writing the same key are
            # idempotent (content-addressed), last rename wins
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                f.write(blob)
            os.replace(tmp, path)
        except (OSError, TypeError, ValueError):
            pass  # non-serializable or unwritable: memory layer still works

    # -- core ----------------------------------------------------------
    def _cached_call(self, key_parts: tuple, fn):
        cache = self._cache() if self.cache_size else None
        key = _stable_key(self._model_token, *key_parts) if (cache is not None or self.cache_dir) else None
        if cache is not None and not self.bypass_cache:
            with _state_lock:
                if key in cache:
                    cache.move_to_end(key)
                    if self.metrics:
                        self.metrics.cache_hits += 1
                    return cache[key]
        if key is not None and not self.bypass_cache:
            hit = self._disk_get(key)
            if hit is not None:
                if self.metrics:
                    self.metrics.cache_hits += 1
                if cache is not None:
                    with _state_lock:
                        cache[key] = hit
                        while len(cache) > self.cache_size:
                            cache.popitem(last=False)
                return hit
        bucket = self._bucket()
        if bucket is not None:
            waited = bucket.acquire()
            if waited and self.metrics:
                self.metrics.rate_waits += 1
        attempt = 0
        while True:
            try:
                res = fn()
                break
            except self.retry_on:
                if attempt >= self.max_retries:
                    raise
                if self.metrics:
                    self.metrics.retries += 1
                time.sleep(self.backoff_s * (2**attempt))
                attempt += 1
        if self.metrics:
            self.metrics.calls += 1
            # exact usage when the inner backend reports it (reference
            # api.py litellm usage objects), else chars/4
            usage = getattr(self.inner, "last_usage", None)
            if isinstance(usage, dict) and usage.get("prompt_tokens") is not None:
                self.metrics.prompt_tokens += int(usage.get("prompt_tokens", 0))
                self.metrics.completion_tokens += int(usage.get("completion_tokens", 0))
            else:
                prompt_text = str(key_parts[1]) if len(key_parts) > 1 else ""
                self.metrics.prompt_tokens += max(1, len(prompt_text) // 4)
                self.metrics.completion_tokens += max(1, len(str(res)) // 4)
        if cache is not None:
            with _state_lock:
                cache[key] = res
                while len(cache) > self.cache_size:
                    cache.popitem(last=False)
        if key is not None:
            self._disk_put(key, res)
        return res

    # -- protocol ------------------------------------------------------
    def complete(self, prompt: str, output_schema: dict, context: Any) -> dict:
        return self._cached_call(
            ("complete", prompt, output_schema, context),
            lambda: self.inner.complete(prompt, output_schema, context),
        )

    def complete_batch(self, prompt: str, output_schema: dict, items: list) -> list[dict]:
        return self._cached_call(
            ("complete_batch", prompt, output_schema, items),
            lambda: self.inner.complete_batch(prompt, output_schema, items),
        )

    def classify_logprob(self, prompt: str, labels: list[str], context: Any):
        return self._cached_call(
            ("classify", prompt, labels, context),
            lambda: self.inner.classify_logprob(prompt, labels, context),
        )

    def embed(self, texts: list[str]) -> list[list[float]]:
        """Per-text caching: call inner.embed only on the misses, in one
        batch, preserving input order."""
        if not self.cache_size:
            if not self.cache_dir:
                out = self._retry_embed(texts)
                if self.metrics:
                    self.metrics.calls += 1
                return out
            # memory layer off but the persistent layer is configured:
            # serve/fill disk (complete() honors cache_dir in this
            # configuration — embed must not silently skip it)
            keys = [_stable_key(self._model_token, "embed", t) for t in texts]
            out: list = [None] * len(texts)
            miss = [i for i in range(len(texts))]
            if not self.bypass_cache:
                still = []
                for i in miss:
                    hit = self._disk_get(keys[i])
                    if hit is not None:
                        out[i] = hit
                        if self.metrics:
                            self.metrics.cache_hits += 1
                    else:
                        still.append(i)
                miss = still
            if miss:
                vecs = self._retry_embed([texts[i] for i in miss])
                if self.metrics:
                    self.metrics.calls += 1
                for i, v in zip(miss, vecs):
                    out[i] = v
                    self._disk_put(keys[i], v)
            return out
        cache = self._cache()
        keys = [_stable_key(self._model_token, "embed", t) for t in texts]
        out: list = [None] * len(texts)
        miss_idx: list[int] = []
        with _state_lock:
            for i, k in enumerate(keys):
                if not self.bypass_cache and k in cache:
                    cache.move_to_end(k)
                    out[i] = cache[k]
                else:
                    miss_idx.append(i)
        if self.cache_dir and miss_idx and not self.bypass_cache:
            # persistent layer: fill what disk has before calling inner
            still = []
            for i in miss_idx:
                hit = self._disk_get(keys[i])
                if hit is not None:
                    out[i] = hit
                    with _state_lock:
                        cache[keys[i]] = hit
                else:
                    still.append(i)
            miss_idx = still
        if self.metrics and (len(texts) - len(miss_idx)):
            self.metrics.cache_hits += len(texts) - len(miss_idx)
        if miss_idx:
            vecs = self._retry_embed([texts[i] for i in miss_idx])
            if self.metrics:
                self.metrics.calls += 1
            with _state_lock:
                for i, v in zip(miss_idx, vecs):
                    out[i] = cache[keys[i]] = v
                while len(cache) > self.cache_size:
                    cache.popitem(last=False)
            for i in miss_idx:
                self._disk_put(keys[i], out[i])
        return out

    def _retry_embed(self, texts: list[str]) -> list[list[float]]:
        bucket = self._bucket()
        if bucket is not None:
            waited = bucket.acquire()
            if waited and self.metrics:
                self.metrics.rate_waits += 1
        attempt = 0
        while True:
            try:
                return self.inner.embed(texts)
            except self.retry_on:
                if attempt >= self.max_retries:
                    raise
                if self.metrics:
                    self.metrics.retries += 1
                time.sleep(self.backoff_s * (2**attempt))
                attempt += 1


def clear_persistent_cache(cache_dir: str | None = None) -> int:
    """Delete on-disk response-cache entries (CLI ``clear-cache``;
    reference cli.py clear_cache semantics). Returns entries removed.
    With no directory given, uses $DOCETL_SPARK_CACHE_DIR."""
    import glob
    import os

    cache_dir = cache_dir or os.environ.get("DOCETL_SPARK_CACHE_DIR")
    if not cache_dir or not os.path.isdir(cache_dir):
        return 0
    n = 0
    for f in glob.glob(os.path.join(cache_dir, "**", "*.json"), recursive=True):
        os.remove(f)
        n += 1
    return n


def clear_backend_state(namespace: str | None = None) -> None:
    """Drop process-local cache/bucket state (tests, pipeline resets)."""
    with _state_lock:
        if namespace is None:
            _caches.clear()
            _buckets.clear()
        else:
            _caches.pop(namespace, None)
            _buckets.pop(namespace, None)
