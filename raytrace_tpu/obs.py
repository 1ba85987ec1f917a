"""Observability: metrics, progress reporting, alerts, profiling.

Working TPU-native forms of the reference's dead monitoring/profiling
layers (SURVEY.md §5):
  * MetricsCollector (metrics.go:72-224: atomic counters, 1s aggregate
    ticker, observer pattern) -> RenderMetrics/MetricsCollector with real
    ray/pixel accounting fed by the renderer, host memory via tracemalloc
    and device memory via jax memory stats;
  * ProgressReporter (metrics.go:226-317: 100ms [====>  ] bar with rate
    and ETA) -> same bar, same fields, driven by render callbacks;
  * PerformanceMonitor (metrics.go:319-412: threshold alerts) -> same
    thresholds, observer callbacks instead of prints by default;
  * Profiler (profiler.go:63-159: pprof CPU/heap/trace dumps to
    ./profiles/) -> jax.profiler traces (TensorBoard/XPlane) to a
    directory, plus jax.profiler.annotate ranges; PProfServer
    (profiler.go:195-228) -> jax.profiler.start_server (the live
    inspection endpoint).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import threading
import time
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class RenderMetrics:
    """Parity with the RenderMetrics struct (metrics.go:12-41)."""

    rays_traced: int = 0
    pixels_completed: int = 0
    total_pixels: int = 0
    rays_per_second: float = 0.0
    pixels_per_second: float = 0.0
    elapsed_seconds: float = 0.0
    progress: float = 0.0
    eta_seconds: float = 0.0
    jobs_completed: int = 0
    device_memory_bytes: int = 0
    host_memory_bytes: int = 0

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)


class MetricsCollector:
    """Thread-safe render metrics accounting (metrics.go:72-224).

    The reference used atomics + a 1s ticker; rates here are computed on
    read (no background goroutine needed - the render driver is the only
    writer and observers are notified on record)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._m = RenderMetrics()
        self._start = time.perf_counter()
        self._observers: List[Callable[[RenderMetrics], None]] = []

    def start(self, total_pixels: int) -> None:
        with self._lock:
            self._m = RenderMetrics(total_pixels=total_pixels)
            self._start = time.perf_counter()

    def record_rays(self, n: int) -> None:
        with self._lock:
            self._m.rays_traced += int(n)
        self._notify()

    def record_pixels(self, n: int) -> None:
        with self._lock:
            self._m.pixels_completed += int(n)
        self._notify()

    def record_job_complete(self) -> None:
        with self._lock:
            self._m.jobs_completed += 1
        self._notify()

    def add_observer(self, fn: Callable[[RenderMetrics], None]) -> None:
        self._observers.append(fn)

    def snapshot(self) -> RenderMetrics:
        with self._lock:
            m = dataclasses.replace(self._m)
        m.elapsed_seconds = time.perf_counter() - self._start
        if m.elapsed_seconds > 0:
            m.rays_per_second = m.rays_traced / m.elapsed_seconds
            m.pixels_per_second = m.pixels_completed / m.elapsed_seconds
        if m.total_pixels:
            m.progress = m.pixels_completed / m.total_pixels
            if m.pixels_per_second > 0:
                m.eta_seconds = ((m.total_pixels - m.pixels_completed)
                                 / m.pixels_per_second)
        m.device_memory_bytes = device_memory_in_use()
        m.host_memory_bytes = host_memory_in_use()
        return m

    def _notify(self) -> None:
        if self._observers:
            snap = self.snapshot()
            for fn in self._observers:
                fn(snap)


def device_memory_in_use() -> int:
    """Sum of bytes_in_use across local devices (jax memory_stats)."""
    try:
        import jax
        total = 0
        for d in jax.local_devices():
            stats = d.memory_stats()
            if stats:
                total += int(stats.get("bytes_in_use", 0))
        return total
    except Exception:
        return 0


def host_memory_in_use() -> int:
    """Python heap in use (the MemStats.HeapAlloc analog)."""
    try:
        import resource
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    except Exception:
        return 0


class ProgressReporter:
    """[=====>    ] 52.3% | 1.2M rays/s | ETA 3.2s  (metrics.go:226-317)."""

    def __init__(self, collector: MetricsCollector, width: int = 40,
                 stream=None, min_interval: float = 0.1):
        self.collector = collector
        self.width = width
        self.stream = stream or sys.stderr
        self.min_interval = min_interval
        self._last = 0.0

    def report(self, force: bool = False) -> None:
        now = time.perf_counter()
        if not force and now - self._last < self.min_interval:
            return
        self._last = now
        m = self.collector.snapshot()
        filled = int(self.width * m.progress)
        bar = ("=" * max(0, filled - 1)
               + (">" if 0 < filled < self.width else "=" * (filled > 0))
               + " " * (self.width - filled))
        self.stream.write(
            f"\r[{bar}] {m.progress * 100:5.1f}% | "
            f"{m.rays_per_second / 1e6:6.2f}M rays/s | "
            f"ETA {m.eta_seconds:5.1f}s")
        self.stream.flush()

    def finish(self) -> None:
        self.report(force=True)
        self.stream.write("\n")
        self.stream.flush()


@dataclasses.dataclass
class Alert:
    name: str
    message: str
    value: float
    threshold: float
    timestamp: float


class PerformanceMonitor:
    """Threshold alerts (metrics.go:319-412): memory > 100MB device,
    rays/s < 1000 once tracing has started."""

    def __init__(self, collector: MetricsCollector,
                 max_memory_bytes: int = 100 * 1024 * 1024,
                 min_rays_per_second: float = 1000.0):
        self.collector = collector
        self.max_memory_bytes = max_memory_bytes
        self.min_rays_per_second = min_rays_per_second
        self.alerts: List[Alert] = []
        self._handlers: List[Callable[[Alert], None]] = []

    def add_handler(self, fn: Callable[[Alert], None]) -> None:
        self._handlers.append(fn)

    def check(self) -> List[Alert]:
        m = self.collector.snapshot()
        new: List[Alert] = []
        if m.device_memory_bytes > self.max_memory_bytes:
            new.append(Alert("memory", "device memory above threshold",
                             m.device_memory_bytes, self.max_memory_bytes,
                             time.time()))
        if (m.rays_traced > 0 and m.elapsed_seconds > 1.0
                and m.rays_per_second < self.min_rays_per_second):
            new.append(Alert("throughput", "rays/s below threshold",
                             m.rays_per_second, self.min_rays_per_second,
                             time.time()))
        self.alerts.extend(new)
        for a in new:
            for fn in self._handlers:
                fn(a)
        return new


class Profiler:
    """jax.profiler wrapper (working form of profiler.go:43-159).

    start()/stop() dump an XPlane/TensorBoard trace to `out_dir`;
    annotate() wraps a region with a named trace annotation (the
    runtime/trace analog); start_server() exposes the live profiling
    endpoint (the PProfServer analog, profiler.go:195-228).
    """

    def __init__(self, out_dir: str = "./profiles"):
        self.out_dir = out_dir
        self.active = False
        self._server = None

    def start(self) -> None:
        import jax
        jax.profiler.start_trace(self.out_dir)
        self.active = True

    def stop(self) -> None:
        import jax
        if self.active:
            jax.profiler.stop_trace()
            self.active = False

    def annotate(self, name: str):
        """Context manager naming a trace region."""
        import jax
        return jax.profiler.TraceAnnotation(name)

    def start_server(self, port: int = 6060) -> None:
        import jax
        self._server = jax.profiler.start_server(port)

    def stop_server(self) -> None:
        if self._server is not None:
            import jax
            # jax.profiler.stop_server() shuts down the singleton gRPC
            # profiling server started by start_server (dropping the
            # reference alone leaves the port bound).
            jax.profiler.stop_server()
            self._server = None

    def get_stats(self) -> Dict:
        """Full memory stats dump (the MemStats dump, profiler.go:161-193)."""
        stats: Dict = {"host_memory_bytes": host_memory_in_use(),
                       "device_memory_bytes": device_memory_in_use()}
        try:
            import jax
            for d in jax.local_devices():
                ms = d.memory_stats()
                if ms:
                    stats[f"device_{d.id}"] = {k: int(v)
                                               for k, v in ms.items()}
        except Exception:
            pass
        return stats

    def save_stats(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.get_stats(), f, indent=2)
