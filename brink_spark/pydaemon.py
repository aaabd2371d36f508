"""Python worker daemon with vectorized-library preload.

Spark's PythonWorkerFactory culls idle Python workers after a hardcoded
one minute (PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS), so any
Arrow/pandas UDF stage that runs more than a minute after the previous
one pays a full 32-worker cold start — fork + numpy/pandas/pyarrow
import per worker — measured at 26-42 s on this host's slow disk, which
dominated q_embed_neardup's wall in a full bench pass (the distributed
matmul itself is ~1 s warm). Forked workers inherit the daemon's
imported modules via copy-on-write, so importing the heavy vectorized
libraries ONCE here (guide §4.5's init-once principle applied to the
interpreter itself) cuts the cold start to the fork+handshake floor
(measured 42.5 s → 10-16 s for 32 workers).

The preload is best-effort: a missing library must never break worker
startup (the daemon protocol below is unchanged from pyspark.daemon).
"""

try:  # pragma: no cover - import side effects only
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
