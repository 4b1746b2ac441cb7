from .block_knn import estimate_rows, farthest_scores_df, knn_join, knn_scores_df  # noqa: F401
from .dedup import (  # noqa: F401
    connected_components,
    exact_duplicates,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .range_join import (  # noqa: F401
    get_indices_clear_pairs,
    neighbor_within_range,
    neighbor_within_range_low_prec,
    neighbor_within_range_low_prec_float,
)
from .ranking import bucketed_cumsums, bucketed_ranks, with_group_size  # noqa: F401
from .sampling import hash_sample, sample_predicate, stratified_sample  # noqa: F401
from .neardup_index import (  # noqa: F401
    minhash_index_build,
    minhash_index_check,
    minhash_index_pairs,
    minhash_index_probe,
    minhash_index_refresh,
)
from .similarity import (  # noqa: F401
    ann_cosine_topk,
    ann_neardup_pairs,
    cosine_pairs,
    cosine_topk_join,
    ivf_fit,
    ivf_index_append,
    ivf_index_build,
    ivf_index_search,
    ivf_knn_join,
    ivf_topk,
    rp_lsh_buckets,
    rp_lsh_candidate_pairs,
)
from .thresholds import add_threshold_labels  # noqa: F401
from .decontaminate import benchmark_shingle_dict, contamination_report  # noqa: F401
from .packing import (  # noqa: F401
    bucketed_cumsum,
    chunk_documents,
    contiguous_token_shards,
    shard_report,
)
from .quantize import global_scale, quantization_report  # noqa: F401
from .skew import DEFAULT_BUCKET_CAP, capped_self_join_pairs  # noqa: F401
from .sampling import shuffle_order  # noqa: F401
from .vocab import merge_pair_topk, token_stats, vocab_topk  # noqa: F401
from .winnow import winnow_fingerprints, winnow_pairs  # noqa: F401
