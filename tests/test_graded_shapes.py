"""Graded-output shape contract: NO registered query may return a top-level
array/map column.

The driver's correctness pass canonicalizes each result with pandas
`sort_values` over all columns before hashing; list/map cells are unhashable
there, so an array-typed output column crashes the grade even when the values
are right (CORRECTNESS_r05 `pq_codes`: "TypeError: unhashable type: 'list'").
Round 5's local mimic masked this with a list->tuple leniency
(`tools/grade_local.py`), which is now removed — this sweep makes the
contract mechanical so a rotation can never pre-certify an ungradeable query
again. Library APIs may still return arrays (`clustering.pq_encode`,
`multimodal.fake_image_features`); only the REGISTERED graded row must
project them to scalars (string-join, element_at, or posexplode).
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType

from mini_flink_spark.queries import all_queries


def test_no_registered_query_returns_toplevel_array_or_map(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, fn in all_queries().items():
        # schema extraction needs fn() to return — cheap plan construction
        # for most queries, but the EXECUTES_ON_BUILD subset (kmeans/PQ/BPE
        # fits, eager persists) and the streaming drains run real Spark jobs
        # here, so this sweep costs minutes at fixture scale, not seconds
        df = fn(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "graded queries with driver-unsortable top-level array/map columns "
        f"(project to scalars before registering): {offenders}"
    )
