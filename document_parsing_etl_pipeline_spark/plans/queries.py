"""Query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame builder plus a DuckDB oracle SQL string.

Round 11: the former 20k-line monolith is split along the SURVEY §2
sections. This module keeps the stable public import path — the
registry dicts, every shared helper, and all query definitions are
re-exported here:

- plans/_prelude.py      registry infra + shared helpers/constants/SQL
- plans/section_a_parse.py        §2.A parse / chunk / NER / charts
- plans/section_b_docstore.py     §2.B doc-store query surface
- plans/section_c_analytics.py    §2.C analytics engine
- plans/section_d_dedup.py        §2.D deduplication
- plans/section_e_similarity.py   §2.E similarity search
- plans/section_f_text.py         §2.F text analysis & corpus ops
- plans/section_g_multimodal.py   §2.G multimodal batch pipelines
- plans/section_h_scale.py        §2.H scale utilities

The engine-parity protocol (decimal sums, epoch-micros timestamps,
md5 hashes, RE2-safe regexes, rounded transcendentals) is documented
in plans/_prelude.py's module docstring.
"""

from __future__ import annotations

from ._prelude import *  # noqa: F401,F403
from . import (  # noqa: F401  (imported for @register side effects)
    section_a_parse,
    section_b_docstore,
    section_c_analytics,
    section_d_dedup,
    section_e_similarity,
    section_f_text,
    section_g_multimodal,
    section_h_scale,
)
