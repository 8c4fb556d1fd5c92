"""`%{field}` / `%{+fmt}` template → native Column expression compiler.

go-logagent formats sink payloads and patch values with logstash-style
templates (reference utils Format(); see SURVEY.md §1.1 "Interpolation").
We compile the template ONCE at plan build time into a `concat` of literal
chunks, `coalesce(cast(col as string), '')` field refs, and
`date_format(ts, fmt)` time refs — all JVM-side whole-stage-codegen
expressions; no Python at run time.

Semantics (FIXTURES.md §A3 patch rows):
- `%{field}`   → the field's value as string; NULL value → empty string
- `%{+fmt}`    → event timestamp (`ts` column) formatted with Java/Joda
                 pattern `fmt` (logstash uses `%{+yyyy-MM-dd}` style)
- unknown field (not a column at compile time) → literal text kept verbatim
  (documented choice; SURVEY.md §0 item 5 is un-verifiable with an empty
  reference checkout)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TEMPLATE_REF = re.compile(r"%\{(\+?[^}]+)\}")


def compile_template(template: str, df: DataFrame, ts_col: str = "ts") -> Column:
    """Compile a `%{...}` template string to a single Column expression."""
    cols = set(df.columns)
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_REF.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        ref = m.group(1)
        if ref.startswith("+"):
            parts.append(F.date_format(F.col(ts_col), ref[1:]))
        elif ref in cols:
            parts.append(F.coalesce(F.col(ref).cast("string"), F.lit("")))
        else:
            parts.append(F.lit(m.group(0)))  # unknown field: keep literal
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)
