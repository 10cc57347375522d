"""Round-8 wave-61 workload: streaming_welch_monitor — the Welch
two-sample readout (wave-48) as a live streaming monitor, completing
the streaming-guardrail pair: streaming_srm_monitor watches the
ASSIGNMENT (arm sizes, insert-only dedup state);
this watches the METRIC (per-user value sums, an UPDATABLE user-keyed
streaming aggregation — the state shape late events mutate). The
readout layer (workload.wave48.welch_readout) is shared verbatim with
the batch query and the oracle is WELCH_ORACLE verbatim, so the
driver's differential check enforces streaming == batch row-for-row.

Scale shape: streaming state is one row per user; the emitted table
feeds the same 2-row arm frame + pooled windows as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import query
from .wave48 import WELCH_ORACLE


@query("streaming_welch_monitor", oracle=WELCH_ORACLE)
def streaming_welch_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of streaming.landing.stream_welch_monitor: the
    events stream's per-user cents sums as streaming state, Welch
    arm readout display-side — equals events_welch_ttest exactly."""
    from ..streaming.landing import stream_welch_monitor

    return stream_welch_monitor(spark, sf_dir)
