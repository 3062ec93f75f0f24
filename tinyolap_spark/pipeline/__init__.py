"""Large-scale training-data pipeline operators (beyond reference parity).

Every operator here is designed for the 100 TB case: shuffle-minimal
DataFrame compositions of built-in functions where possible, Arrow-batched
pandas UDFs where Python is unavoidable, and documented partitioning
strategies.  See each module's docstring for the scale analysis.
"""

from . import (  # noqa: F401
    clustering,
    decontam,
    dedup,
    events,
    joins,
    mixture,
    multimodal,
    packing,
    sampling,
    similarity,
    skew,
    text,
    timekeys,
)
