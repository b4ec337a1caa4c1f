"""F1/F2 — inline bibliography-reference parsing with character offsets.

Reference semantics (/root/reference/src/extraction.rs:567-602, regex at
:156-157): every ``(...)`` group preceded by at least one character (non-space
or a single space — i.e. never at string start) is a candidate; the inner text
splits on ';' into segments; each trimmed segment splits at its FIRST space
into (code, spec); codes not starting with an uppercase letter are dropped
(editorial parens like "(den gamle)" die here, not at the regex).

Offsets are **byte** offsets of '(' and one past ')' — the reference stores
Rust ``str`` byte indices (src/storage.rs:544-545). We therefore run the
regex over UTF-8 bytes; for ASCII quotes byte == codepoint offsets.

This is the one extraction primitive that genuinely needs a UDF: Spark's
regexp functions return matches, not positions. It is an Arrow-batched
pandas_udf, and the per-row work is a single compiled-regex scan.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

INLINE_REF_REGEX = re.compile(rb"(?:\S| )\(([^)]+)\)")

REF_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("offset_start", T.IntegerType()),
            T.StructField("offset_end", T.IntegerType()),
            T.StructField("code", T.StringType()),
            T.StructField("spec", T.StringType()),
        ]
    )
)


def extract_refs_from_quote(content: str) -> list[tuple[int, int, str, str | None]]:
    """Pure-Python core, unit-testable against the reference's goldens."""
    if content is None:
        return []
    data = content.encode("utf-8")
    refs: list[tuple[int, int, str, str | None]] = []
    for m in INLINE_REF_REGEX.finditer(data):
        inner = m.group(1)
        paren_start = m.start() + m.group(0).find(b"(")
        paren_end = m.end()
        for segment in inner.split(b";"):
            segment = segment.strip()
            if not segment:
                continue
            sp = segment.find(b" ")
            if sp == -1:
                code_b, spec_b = segment, None
            else:
                code_b = segment[:sp]
                spec_trim = segment[sp + 1 :].strip()
                spec_b = spec_trim if spec_trim else None
            code = code_b.decode("utf-8", errors="replace")
            first = code[:1]
            if not first or not first.isupper():
                continue
            refs.append(
                (
                    paren_start,
                    paren_end,
                    code,
                    spec_b.decode("utf-8", errors="replace") if spec_b is not None else None,
                )
            )
    return refs


@F.pandas_udf(REF_STRUCT)
def inline_refs_udf(content: pd.Series) -> pd.Series:
    return content.map(
        lambda c: [
            {"offset_start": s, "offset_end": e, "code": code, "spec": spec}
            for (s, e, code, spec) in extract_refs_from_quote(c)
        ]
    )
