"""Generic namespaced benchmark cache — on-disk winners for autotuned ops.

TPU-native rebuild of the reference's benchmark-cache subsystem
(``warpconvnet/utils/benchmark_cache.py`` — ``GenericBenchmarkCache:507``,
``SpatiallySparseConvConfig:411``, ``_FileLock:104``): a versioned,
namespaced, on-disk cache of per-shape autotune winners with atomic writes,
bounded file locking (liveness over durability on shared filesystems), and
process-0-only write discipline for multi-host runs.

Differences from the reference, by design:
* JSON instead of msgpack (no extra dependency; entries are tiny).
* Keys are **log2-binned** shape configs + chip generation — the analog of
  the reference's log10 binning + SM capability (``benchmark_cache.py:411``).
  Binning bounds the number of distinct compiled programs AND the number of
  tuned entries.
* Multi-host discipline: every process reads; only ``jax.process_index()==0``
  writes (reference writes rank-0 with an fcntl lock).
"""

from __future__ import annotations

import atexit
import dataclasses
import fcntl
import json
import math
import os
import signal
import tempfile
import threading
import time
from typing import Any, Callable, Dict, Optional, Tuple

CACHE_VERSION = "1.0"

# Version migration hooks (reference ``benchmark_cache.py:364`` — stale-
# version files are migrated forward instead of discarded). Maps an old
# version string to a function ``namespaces -> namespaces`` producing the
# NEXT version's layout; chains run until CACHE_VERSION is reached.
_MIGRATIONS: Dict[str, Tuple[str, Callable[[Dict[str, Any]], Dict[str, Any]]]] = {}


def register_migration(
    from_version: str, to_version: str, fn: Callable[[Dict[str, Any]], Dict[str, Any]]
) -> None:
    """Register a one-step cache-layout migration ``from_version -> to_version``."""
    _MIGRATIONS[from_version] = (to_version, fn)


def _migrate(version: str, namespaces: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """Chain registered migrations to CACHE_VERSION; None if no path exists."""
    hops = 0
    while version != CACHE_VERSION:
        step = _MIGRATIONS.get(version)
        if step is None or hops > 16:
            return None
        version, fn = step
        namespaces = fn(namespaces)
        hops += 1
    return namespaces

# Namespaces mirror the reference's three GEMM directions
# (AB_gather_scatter / ABt_gather_scatter / AtB_gather_gather).
NS_FORWARD = "AB_gather_scatter"
NS_DGRAD = "ABt_gather_scatter"
NS_WGRAD = "AtB_gather_gather"
# Depthwise (FMA) directions — the reference keeps separate cache
# namespaces for its depthwise unified Function
# (``nn/functional/sparse_conv_depth.py:657``).
NS_DEPTH_FORWARD = "depth_fma_fwd"
NS_DEPTH_DGRAD = "depth_fma_dgrad"
NS_DEPTH_WGRAD = "depth_fma_wgrad"


def _default_cache_dir() -> str:
    from warpconvnet_tpu.constants import get_benchmark_cache_dir

    return get_benchmark_cache_dir()


def log2_bin(n: int) -> int:
    """Log2 shape bin; small sizes (<1024) collapse into one bin
    (the reference collapses N<10K into a single log10 bin)."""
    if n < 1024:
        return 10
    return int(math.floor(math.log2(n)))


def chip_generation() -> str:
    """Device kind string, the analog of the reference's SM capability."""
    try:
        import jax

        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # pragma: no cover - no backend
        return "unknown"


@dataclasses.dataclass(frozen=True)
class SparseConvConfig:
    """Shape-binned autotune key (reference ``SpatiallySparseConvConfig:411``)."""

    num_in_bin: int
    num_out_bin: int
    in_channels: int
    out_channels: int
    kernel_volume: int
    dtype: str
    chip: str

    @classmethod
    def from_shapes(
        cls, num_in: int, num_out: int, c_in: int, c_out: int, k: int, dtype
    ) -> "SparseConvConfig":
        return cls(
            num_in_bin=log2_bin(num_in),
            num_out_bin=log2_bin(num_out),
            in_channels=c_in,
            out_channels=c_out,
            kernel_volume=k,
            dtype=str(dtype),
            chip=chip_generation(),
        )

    def key(self) -> str:
        return (
            f"n{self.num_in_bin}_m{self.num_out_bin}_ci{self.in_channels}"
            f"_co{self.out_channels}_k{self.kernel_volume}_{self.dtype}_{self.chip}"
        )


class _FileLock:
    """Bounded fcntl lock (reference ``_FileLock:104``): give up after
    ``timeout_s`` — a stale lock must not hang training."""

    def __init__(self, path: str, timeout_s: float = 10.0):
        self.path = path
        self.timeout_s = timeout_s
        self._fd: Optional[int] = None

    def __enter__(self) -> bool:
        deadline = time.monotonic() + self.timeout_s
        self._fd = os.open(self.path, os.O_CREAT | os.O_RDWR)
        while True:
            try:
                fcntl.flock(self._fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                return True
            except OSError:
                if time.monotonic() > deadline:
                    os.close(self._fd)
                    self._fd = None
                    return False
                time.sleep(0.05)

    def __exit__(self, *exc):
        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


class GenericBenchmarkCache:
    """Namespaced key -> winner-record cache with atomic on-disk persistence.

    Records are ``{"algo": str, "params": dict, "ms": float}``-shaped dicts
    (free-form JSON values). In-memory dict is authoritative between saves;
    merge-on-load keeps faster entries.
    """

    def __init__(self, cache_dir: Optional[str] = None, filename: str = "benchmark_cache.json"):
        self.cache_dir = cache_dir or _default_cache_dir()
        self.path = os.path.join(self.cache_dir, filename)
        self._lock = threading.Lock()
        self._data: Dict[str, Dict[str, Any]] = {}
        self._dirty = False
        self._loaded = False
        self.hits = 0
        self.misses = 0
        self.missed_keys: set = set()
        self._saver: Optional[threading.Thread] = None
        self._saver_stop = threading.Event()

    # -- background persistence (reference benchmark_cache.py:929 background
    # saver thread + :979 SIGTERM/atexit flush) --------------------------------
    def start_background_saver(self, interval_s: float = 30.0) -> None:
        """Start a daemon thread flushing dirty winners every ``interval_s``.
        Long tuning runs survive a kill without losing completed entries."""
        if self._saver is not None and self._saver.is_alive():
            return
        self._saver_stop.clear()

        def _loop() -> None:
            while not self._saver_stop.wait(interval_s):
                try:
                    self.save()
                except Exception:  # never take down the training process
                    pass

        self._saver = threading.Thread(
            target=_loop, name="wct-benchmark-cache-saver", daemon=True
        )
        self._saver.start()

    def stop_background_saver(self) -> None:
        self._saver_stop.set()
        if self._saver is not None:
            self._saver.join(timeout=1.0)
            self._saver = None
        self.save()

    # -- in-memory API -------------------------------------------------------
    def get(self, namespace: str, key: str) -> Optional[Any]:
        self._ensure_loaded()
        with self._lock:
            rec = self._data.get(namespace, {}).get(key)
            if rec is None:
                self.misses += 1
                self.missed_keys.add(f"{namespace}/{key}")
            else:
                self.hits += 1
            return rec

    def put(self, namespace: str, key: str, value: Any) -> None:
        self._ensure_loaded()
        with self._lock:
            self._data.setdefault(namespace, {})[key] = value
            self._dirty = True

    def namespace(self, namespace: str) -> Dict[str, Any]:
        self._ensure_loaded()
        with self._lock:
            return dict(self._data.get(namespace, {}))

    # -- persistence -----------------------------------------------------------
    def _ensure_loaded(self) -> None:
        if self._loaded:
            return
        with self._lock:
            if self._loaded:
                return
            self._loaded = True
            try:
                with open(self.path) as f:
                    blob = json.load(f)
                if blob.get("version") == CACHE_VERSION:
                    self._data = blob.get("namespaces", {})
                else:
                    # Stale layout: run registered migrations forward
                    # (reference benchmark_cache.py:364); unmigratable
                    # versions start fresh rather than poisoning dispatch.
                    migrated = _migrate(
                        str(blob.get("version")), blob.get("namespaces", {})
                    )
                    if migrated is not None:
                        self._data = migrated
                        self._dirty = True
            except (OSError, json.JSONDecodeError, ValueError):
                self._data = {}

    def _is_writer(self) -> bool:
        try:
            import jax

            return jax.process_index() == 0
        except Exception:  # pragma: no cover
            return True

    def save(self) -> bool:
        """Atomic merge + write (tmp file + rename). Process-0 only.
        Best-effort: returns False on lock timeout or IO failure."""
        self._ensure_loaded()
        if not self._is_writer():
            return False
        with self._lock:
            if not self._dirty:
                return True
            data = {ns: dict(v) for ns, v in self._data.items()}
        try:
            os.makedirs(self.cache_dir, exist_ok=True)
            with _FileLock(self.path + ".lock") as locked:
                if not locked:
                    return False
                # Merge with what's on disk (another process may have written).
                try:
                    with open(self.path) as f:
                        on_disk = json.load(f).get("namespaces", {})
                except (OSError, json.JSONDecodeError, ValueError):
                    on_disk = {}
                for ns, entries in on_disk.items():
                    mine = data.setdefault(ns, {})
                    for k, v in entries.items():
                        if k not in mine:
                            mine[k] = v
                        else:
                            # keep the faster record when both carry timings
                            old_ms = v.get("ms") if isinstance(v, dict) else None
                            new_ms = (
                                mine[k].get("ms") if isinstance(mine[k], dict) else None
                            )
                            if old_ms is not None and new_ms is not None and old_ms < new_ms:
                                mine[k] = v
                fd, tmp = tempfile.mkstemp(dir=self.cache_dir, suffix=".tmp")
                with os.fdopen(fd, "w") as f:
                    json.dump({"version": CACHE_VERSION, "namespaces": data}, f)
                os.replace(tmp, self.path)
            with self._lock:
                self._data = data
                self._dirty = False
            return True
        except OSError:
            return False


_global_cache: Optional[GenericBenchmarkCache] = None
_global_cache_lock = threading.Lock()
_exit_hooks_installed = False


def _install_exit_hooks() -> None:
    """Flush the global cache on interpreter exit and on SIGTERM (reference
    benchmark_cache.py:979 — a preempted/killed tuning job keeps its
    winners). The SIGTERM handler chains to any pre-existing handler; it is
    only installed from the main thread (signal module requirement)."""
    global _exit_hooks_installed
    if _exit_hooks_installed:
        return
    _exit_hooks_installed = True

    def _flush() -> None:
        cache = _global_cache
        if cache is not None:
            try:
                cache.save()
            except Exception:
                pass

    atexit.register(_flush)
    if threading.current_thread() is threading.main_thread():
        prev = signal.getsignal(signal.SIGTERM)

        def _on_sigterm(signum, frame):
            _flush()
            if callable(prev):
                prev(signum, frame)
            else:
                signal.signal(signal.SIGTERM, signal.SIG_DFL)
                os.kill(os.getpid(), signal.SIGTERM)

        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
        except (ValueError, OSError):  # non-main thread / restricted env
            pass


def get_benchmark_cache() -> GenericBenchmarkCache:
    global _global_cache
    with _global_cache_lock:
        if _global_cache is None:
            _global_cache = GenericBenchmarkCache()
            _install_exit_hooks()
        return _global_cache
