from worker_spark.functions.inline_refs import (
    extract_refs_from_quote,
    inline_refs_udf,
)
from worker_spark.functions.json_walk import (
    walk_bibl_ids_udf,
    walk_related_ids_udf,
)

__all__ = [
    "extract_refs_from_quote",
    "inline_refs_udf",
    "walk_bibl_ids_udf",
    "walk_related_ids_udf",
]
