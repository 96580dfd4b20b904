"""Query inventory over the TESTDATA star schema.

Importing the submodules registers every query in ``registry``. Modules:
  relational  — SURVEY.md §2.2-2.7 operators (project/filter/case, date/tz,
                joins, aggregations, windows, sorts/sets)
  pipelines   — reference-pipeline analogs run end-to-end (waterfall
                apportionment, cohort, DPD, calendar dim, accounting rollups)
  extensions  — training-data operators (dedup family, similarity search,
                text analysis, multimodal plumbing)
  training    — training-data operators part 2 (temporal joins, mixture
                sampling, sequence packing, IVF ANN, corpus curation)
  quality     — training-data operators part 3 (repetition filters, PII
                redaction, BM25 retrieval)
"""

from __future__ import annotations

_LOADED = False


def load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import relational, pipelines, extensions, training, quality  # noqa: F401
    _LOADED = True
