"""Custom operators Spark lacks as single built-ins (SURVEY.md §2.5 J6,
§2.11 L1-L7): compositions of DataFrame ops first, Pandas-UDF plumbing only
where built-ins genuinely can't express the semantics (multimodal decode).
"""

from mrjob_spark.operators.asof import asof_join  # noqa: F401
from mrjob_spark.operators.topk import top_k_per_group  # noqa: F401
from mrjob_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    normalized_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_fingerprints,
    jaccard_pairs,
    embedding_neardup_pairs,
)
from mrjob_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    bucketed_topk,
    hyperplane_lsh_topk,
)
from mrjob_spark.operators.graph import connected_components  # noqa: F401
from mrjob_spark.operators.skew import (  # noqa: F401
    salted_collect_set,
    salted_equi_join,
    with_salt,
)
