"""Pattern-based categorization stage (P13).

Analog of the reference's ``like '%...%'``-driven zone attribute
derivation (``nyc_taxi_dbt/models/marts/core/dim_zones.sql:5-8``:
airport/manhattan flags from name patterns): a reusable first-match
rule engine over a string column.

Ray-Data shape: a callable CLASS for ``map_batches`` — substring
matchers (or compiled RE2 regexes via ``match_substring_regex``) are
prepared ONCE per actor in ``__init__``; each batch is one vectorized
Arrow ``match_substring`` per rule + a single ``np.select``.  No per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class PatternCategorizer:
    """First-matching-pattern labeler.

    rules: ordered ``(pattern, label)`` pairs — CASE-WHEN semantics,
    first hit wins (matching the reference's CASE ordering).
    ``regex=False`` uses plain substring containment (SQL ``like
    '%pat%'`` / ``contains``); ``regex=True`` uses RE2 patterns.
    """

    def __init__(
        self,
        column: str,
        rules: list[tuple[str, str]],
        *,
        default: str = "other",
        out_col: str = "category",
        regex: bool = False,
        ignore_case: bool = False,
    ):
        self.column = column
        self.rules = list(rules)
        self.default = default
        self.out_col = out_col
        self.regex = regex
        self.ignore_case = ignore_case

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.column]
        match = pc.match_substring_regex if self.regex else pc.match_substring
        masks = [
            pc.fill_null(match(col, pat, ignore_case=self.ignore_case), False).to_numpy(
                zero_copy_only=False
            )
            for pat, _ in self.rules
        ]
        labels = np.select(masks, [lab for _, lab in self.rules], default=self.default)
        if self.out_col in t.schema.names:
            t = t.drop_columns([self.out_col])
        return t.append_column(self.out_col, pa.array(labels.astype(object), pa.string()))
