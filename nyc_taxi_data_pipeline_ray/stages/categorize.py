"""Pattern-based categorization stage (P13).

Analog of the reference's ``like '%...%'``-driven zone attribute
derivation (``nyc_taxi_dbt/models/marts/core/dim_zones.sql:5-8``:
airport/manhattan flags from name patterns): a reusable first-match
rule engine over a string column.

Ray-Data shape: a callable CLASS for ``map_batches`` — the rule list is
validated and frozen once per actor in ``__init__``; each batch is one
vectorized Arrow ``match_substring``/``match_substring_regex`` per rule
+ a single ``np.select``.  (Arrow's RE2 compile happens inside the
kernel per call — there is no precompiled-pattern handle to hold — but
it is a rounding error next to the match itself.)  No per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nyc_taxi_data_pipeline_ray.stages import replace_column


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
        if not self.rules:
            # np.select rejects an empty condition list; no rules means
            # everything takes the default label
            labels = np.full(t.num_rows, self.default, object)
            return replace_column(t, self.out_col, pa.array(labels, pa.string()))
        match = pc.match_substring_regex if self.regex else pc.match_substring
        masks = [
            pc.fill_null(match(col, pat, ignore_case=self.ignore_case), False).to_numpy(
                zero_copy_only=False
            )
            for pat, _ in self.rules
        ]
        labels = np.select(masks, [lab for _, lab in self.rules], default=self.default)
        return replace_column(
            t, self.out_col, pa.array(labels.astype(object), pa.string())
        )
