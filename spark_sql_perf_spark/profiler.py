"""Sampled CPU profiling for benchmark runs — the durable core of the
reference's CpuProfile (CpuProfile.scala:36-127) re-expressed.

The reference records twitter-jvm stack samples to JSON on each
executor, ships them to DBFS, and renders with a privately-copied
pprof binary over graphviz (CpuProfile.scala:47-56 literally
``sudo apt-get install graphviz`` + ``cp /dbfs/home/michael/pprof``).
None of those paths exist outside that environment; what survives is
the capability: *sample stacks while a query runs, aggregate identical
stacks, emit a format standard tooling renders*. This module samples
the JVM through py4j (``org.apache.spark.util.Utils.getThreadDump`` —
stack frames arrive pre-stringified, one ``mkString`` round-trip per
thread) at a fixed rate and aggregates RUNNABLE executor-thread stacks
into collapsed-stack lines (``root;frame;leaf count``) — the input
format of flamegraph.pl, speedscope, and pprof alike.

Scope honesty: in ``local[n]`` mode the driver JVM *is* the executor,
so task threads are fully visible — the mode every harness run here
uses. On a multi-node cluster a py4j sampler only sees the driver;
attach async-profiler per executor there and feed its collapsed output
to :meth:`CpuProfileResult.merge` unchanged.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

_EXECUTOR_THREAD_PREFIX = "Executor task launch worker"


@dataclass
class CpuProfileResult:
    """Aggregated stack samples: collapsed-stack line -> sample count."""

    samples: dict[str, int] = field(default_factory=dict)
    n_ticks: int = 0
    hz: float = 0.0

    def collapsed(self) -> list[str]:
        """flamegraph.pl / speedscope / pprof input lines."""
        return [
            f"{stack} {count}"
            for stack, count in sorted(
                self.samples.items(), key=lambda kv: -kv[1]
            )
        ]

    def top_frames(self, n: int = 10) -> list[tuple[str, int]]:
        """Leaf frames ranked by self (exclusive) sample count — the
        frame actually on-CPU when the sample fired, not its callers."""
        leaves: dict[str, int] = {}
        for stack, count in self.samples.items():
            leaf = stack.rsplit(";", 1)[-1]
            leaves[leaf] = leaves.get(leaf, 0) + count
        return sorted(leaves.items(), key=lambda kv: -kv[1])[:n]

    def merge(self, collapsed_lines: list[str]) -> None:
        """Fold in externally-collected collapsed stacks (e.g. a
        per-executor async-profiler dump on a real cluster)."""
        for line in collapsed_lines:
            stack, _, count = line.rpartition(" ")
            if stack and count.isdigit():
                self.samples[stack] = self.samples.get(stack, 0) + int(count)


class CpuProfiler:
    """Background sampler over the local JVM's executor task threads.

    Usage::

        prof = CpuProfiler(spark, hz=10)
        prof.start()
        ...  run the query ...
        result = prof.stop()
        result.collapsed()[:40]
    """

    def __init__(
        self,
        spark: SparkSession,
        hz: float = 10.0,
        thread_prefix: str = _EXECUTOR_THREAD_PREFIX,
    ) -> None:
        self._jvm = spark.sparkContext._jvm
        self.hz = hz
        self.thread_prefix = thread_prefix
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self.result = CpuProfileResult(hz=hz)

    def _tick(self) -> None:
        utils = self._jvm.org.apache.spark.util.Utils
        for info in utils.getThreadDump():
            name = info.threadName()
            if not name.startswith(self.thread_prefix):
                continue
            if str(info.threadState()) != "RUNNABLE":
                continue
            # frames arrive pre-stringified; one py4j call flattens the
            # whole stack, leaf-first -> reverse to root-first collapsed
            frames = info.stackTrace().elems().mkString("\n")
            if not frames:
                continue
            # each elem stringifies with its own trailing newline and a
            # classloader prefix ("app//", "java.base@17/"); drop both
            cleaned = [
                f.partition("(")[0].strip().rpartition("/")[2]
                for f in frames.split("\n")
                if f.strip()
            ]
            if not cleaned:
                continue
            stack = ";".join(reversed(cleaned))
            with self._lock:
                self.result.samples[stack] = self.result.samples.get(stack, 0) + 1
        with self._lock:
            self.result.n_ticks += 1

    def _loop(self) -> None:
        period = 1.0 / self.hz
        while not self._stop.is_set():
            t0 = time.perf_counter()
            try:
                self._tick()
            except Exception:
                pass  # a sampler must never take down the run
            self._stop.wait(max(0.0, period - (time.perf_counter() - t0)))

    def start(self) -> "CpuProfiler":
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._loop, name="cpu-profiler", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> CpuProfileResult:
        """Stop sampling and return a consistent snapshot. If the sampler
        thread is wedged inside a py4j call past the join timeout, the
        snapshot is taken under the sampling lock so a late tick can
        never mutate the dict the caller is iterating."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            if self._thread.is_alive():
                with self._lock:
                    return CpuProfileResult(
                        samples=dict(self.result.samples),
                        n_ticks=self.result.n_ticks,
                        hz=self.result.hz,
                    )
        return self.result
