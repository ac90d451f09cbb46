"""Pin pyarrow's intra-process thread pool inside task kernels.

Spark already runs one Python worker PER CORE; pyarrow's default CPU pool
is ALSO sized to the machine (32 here), so every mapInArrow / fused-sink
task spawns a full-width pool and a 32-task wave schedules ~32x32 threads.
Measured on the bench table (64 buckets x ~12 MB, tmpfs): a single-process
16-file bucket read takes 0.43 s with the default pool vs 0.107 s
single-threaded -- the pool is pure overhead at per-task file sizes, and
under 32-way worker concurrency the oversubscription turned a ~2 s
compaction job into 20 s. Task-level parallelism is the engine's scaling
axis; intra-task Arrow threading only fights it.

Called at the top of every task-side kernel (bucket-local merge, fused
CDC sink, DATS meta kernel). Process-global and sticky per reused worker
-- idempotent, so every kernel pins defensively. The DRIVER's pyarrow
(footer reads, oracle checks) is never pinned.
"""

from __future__ import annotations


def pin_arrow_threads(cpu: int = 1) -> None:
    import pyarrow as pa

    try:
        if pa.cpu_count() != cpu:
            pa.set_cpu_count(cpu)
    except Exception:  # pragma: no cover - never fail a task over a knob
        pass
