# Importing populates the query registry. IMPORT ORDER IS LOAD-BEARING:
# the registry dict preserves insertion order, `__spark_entry__.queries()`
# emits it verbatim, and the driver's per-round correctness run checks a
# bounded prefix (first 50 in round 1). Modules are therefore ordered by
# verification priority, NOT alphabetically:
#
#   1. relational  — every SURVEY §2 core parity operator (r1: unchecked)
#   2. scaled      — 100 TB-path variants needing driver certification
#   3. prep/similarity/skew/multimodal — r1: past the window, unchecked
#   4. text/dedup/curation/advanced/events/joins — all driver-green in r1
#
# New round-N queries that need a fresh driver row belong in (or before)
# tier 2/3 modules so they land inside the checked prefix.
from . import relational  # noqa: F401  (tier 1: SURVEY §2 parity)
from . import scaled  # noqa: F401  (tier 2: driver-certified scale paths)
from . import prep, similarity, skew, multimodal  # noqa: F401  (tier 3)
from . import text, dedup, curation, advanced, events, joins  # noqa: F401  (tier 4: green in r1)

from .registry import REGISTRY as _R

#: ids whose SEMANTICS changed this round — they need a fresh driver
#: correctness row regardless of which module defines them, so they are
#: hoisted to the very front of the registry (prefix positions 1..k).
_RECHECK_FIRST = [
    "simhash_near_pairs",  # r2: single-band → multi-band candidates
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
