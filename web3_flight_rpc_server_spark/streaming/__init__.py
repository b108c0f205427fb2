"""Structured Streaming surface (SURVEY.md §2A A3-A5/A14-A16, §2C
C14-C17).

The reference serves unbounded data through a hand-built subscription
state machine (BACKFILLING -> STREAMING with a buffered seam,
reference server/src/main/java/net/broscorp/web3/subscription/
Subscription.java:34-149). Here the micro-batch engine owns offsets,
ordering and recovery; these modules supply what the reference's
machinery provided by hand — plus the windowing/watermark/stateful
semantics the reference never had.
"""

from .backfill import HybridPlan, plan_hybrid, run_hybrid  # noqa: F401
from .dedup import watermarked_dedup  # noqa: F401
from .exactly_once import (  # noqa: F401
    ExactlyOnceParquetSink,
    compact_committed_epochs,
    read_committed,
)
from .lifecycle import QueryRegistry  # noqa: F401
from .multiplex import multiplex, union_upstream_filter  # noqa: F401
from .reorg import latest_log_state  # noqa: F401
from .sources import events_stream  # noqa: F401
from .windows import session_agg, sliding_agg, tumbling_agg  # noqa: F401
