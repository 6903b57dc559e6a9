"""conduino_spark — a PySpark-native analytics engine with the
capabilities of mstksg/conduino (plus the relational + LLM-data-pipeline
extensions the reference lacks, SURVEY.md §2.7/§7).

Public surface:

    from conduino_spark import *

    p = source_list(range(1, 11)) | scan("sum") | sink_list()
    run_pipe(p, spark)      # [1, 3, 6, 10, 15, 21, 28, 36, 45, 55]
"""

from conduino_spark.plans.core import (
    SEQ, Pipeline, Sink, Source, Stage, fenced_where, identity_stage,
    run_pipe, with_seq_from,
)
from conduino_spark.plans.cachereg import release_caches
from conduino_spark.plans.order import rerank
from conduino_spark.session import get_spark
from conduino_spark.sources import (
    Left, from_dataframe, gen_source, iterate_either, iterate_maybe,
    iterate_source, lift_zip_source, range_source, read_csv, read_json,
    read_orc, read_parquet, read_table,
    repeat_either_m, repeat_m, repeat_maybe_m, repeat_source, replicate_m,
    replicate_source, source_binary, source_list, source_text_lines,
    stdin_lines, unfold, unfold_either, unfold_maybe,
)
from conduino_spark.operators.elementwise import (
    concat, concat_map, filter_, iter_m, map_, map_m, with_columns,
)
from conduino_spark.operators.segments import drop, drop_while, take, take_while
from conduino_spark.operators.stateful import (
    consecutive, ewma, map_accum, map_accum_chunked, pairs, passthrough,
    scan, scan_multi,
)
from conduino_spark.operators.sinks import (
    agg_sink, fold, fold_map, fold_monoid, foldl, foldr, head_, last_,
    sink_count, sink_csv, sink_df, sink_json, sink_list, sink_null,
    sink_orc, sink_parquet, sink_parquet_compacted, sink_parquet_sorted,
    sink_parquet_zorder, sink_text,
    zorder_key,
)
from conduino_spark.operators.zip_alt import (
    alt_sink, alt_sink_n, concat_sources, fuse_both, fuse_both_maybe,
    fuse_upstream, lift_zip_sink, uncons_zip_source, zip_sink, zip_sink_n,
    zip_source, zip_source_n,
)
from conduino_spark.operators.bucketing import bucketed_source, write_bucketed
from conduino_spark.operators.relational import (
    cdc_apply, cube_agg, dedup_latest, distinct, event_window, except_all,
    group_agg, intersect, join,
    order_by, percentiles, pivot_agg, profile_diff, profile_table,
    ranked, rollup_agg,
    select, session_window, snapshot_diff, sql_stage, top_k, union_all,
)
from conduino_spark.operators.text import (
    bigram_logprob, bigram_vocab,
    chunk_text, corpus_filter, dsir_logratio, dsir_topk, fingerprint,
    hashing_tf, lang_id, line_dedup,
    normalize_text,
    pack_chunks, perplexity_buckets, quality_score, redact_pii,
    repetition_stats, strip_html,
    script_profile, token_count,
    tokenize, unigram_logprob, unigram_vocab,
)
from conduino_spark.operators.dedup import (
    cosine_prefix_pairs, cosine_tfidf_weights,
    edit_distance_pairs,
    decontaminate, dedup_exact, dedup_exact_against, dup_span_stats,
    dup_span_trim,
    dup_span_flag_against, dup_span_trim_against, dupspan_index_merge,
    dupspan_index_write,
    exact_index_merge, exact_index_write,
    embedding_near_dup_pairs,
    jaccard_prefix_pairs, lsh_candidate_prob, minhash_dedup, semantic_dedup,
    semantic_dedup_against,
    leakage_safe_split, minhash_cc_labels, minhash_dedup_against,
    minhash_dedup_cc,
    minhash_dedup_cc_best,
    minhash_dedup_pairs,
    minhash_eval, minhash_index_dedup, minhash_index_merge,
    minhash_index_write, minhash_signatures, ngram_jaccard_pairs, simhash,
    simhash_dedup_against, simhash_dedup_pairs, simhash_index_dedup,
    simhash_index_merge, simhash_index_write,
    source_overlap, tune_minhash_bands,
    winnow_fingerprints,
)
from conduino_spark.operators.bpe import bpe_encode, bpe_train
from conduino_spark.operators.graph import (
    connected_components, k_core, label_propagation, pagerank,
    triangle_count,
)
from conduino_spark.operators.search import (
    bm25_index_join, bm25_index_merge, bm25_index_write, bm25_join,
    bm25_search,
    build_postings, phrase_search, rrf_fuse,
)
from conduino_spark.operators.rerank import mmr_select
from conduino_spark.operators.similarity import (
    KMeansModel, SQModel, ann_join, ann_recall, cell_centroids, cosine_to,
    ivf_build, ivf_index_join, ivf_index_merge, ivf_index_write,
    ivf_search, ivfpq_index_merge, ivfpq_index_read, ivfpq_index_write,
    ivfpq_search,
    kcenter_select, kcenter_select_sql, kmeans_assign, kmeans_fit,
    knn_brute, knn_lsh, lsh_bucket, lsh_index_merge, lsh_index_write,
    mine_hard_negatives,
    pq_encode, pq_search, sq_encode, sq_search, sq_train,
    pq_train, probe_buckets, rank_metrics, rank_metrics_sql,
    vec_dequantize, vec_quantize_int8,
)
from conduino_spark.operators.classifier import (
    NBModel, QUALITY_FEATURES, LogRegModel, logreg_epoch_update,
    logreg_score, logreg_train, nb_score, nb_train, quality_features,
    quality_features_sql,
)
from conduino_spark.operators.embeddings import (
    PCAModel, normalize_vectors, pca_fit, pca_from_moments,
    pca_transform, vector_moments,
)
from conduino_spark.operators.multimodal import (
    audio_metadata, decode_aiff, decode_bmp, decode_png, decode_pnm,
    container_info,
    decode_wav, encode_aiff, encode_bmp, encode_png, encode_pnm,
    encode_wav, feature_extract, frame_sample, image_metadata,
    image_resize, media_profile, sniff_format, video_metadata,
)
from conduino_spark.operators.mediainfo import (
    encode_mp3_stub, encode_mp4_stub, encode_ogg_stub,
    encode_webm_stub, mp3_info, mp4_info, ogg_info, webm_info,
)
from conduino_spark.operators.jpeg import decode_jpeg, encode_jpeg
from conduino_spark.operators.avi import (avi_frames, decode_avi,
                                          encode_avi_mjpeg)
from conduino_spark.operators.gif import decode_gif, encode_gif
from conduino_spark.operators.flac import decode_flac, encode_flac
from conduino_spark.operators.mp3 import decode_mp3, encode_mp3
from conduino_spark.operators.vorbis import decode_vorbis, encode_vorbis
from conduino_spark.operators.tiff import decode_tiff, encode_tiff
from conduino_spark.operators.skew import salted_group_agg, salted_join
from conduino_spark.operators.temporal import (
    asof_join, funnel, interval_join, rolling_agg, sessionize,
)
from conduino_spark.operators.sketches import (
    binned_quantiles, bloom_build, bloom_contains, bloom_prefilter_join,
    countmin_assemble, countmin_build, countmin_estimate, heavy_hitters,
    hll_build, hll_estimate, hll_merge, kmv_distinct, quantile_buckets,
    winsorize,
)
from conduino_spark.operators.sampling import (
    deterministic_shuffle, hash_sample, hash_split, mixture,
    reservoir_per_key, shard_by, stratified_sample, temperature_fractions,
    weighted_sample,
)
from conduino_spark.operators.adapters import (
    await_forever_with, limited_sink, map_input, map_output, squeeze_pipe,
    to_local_iterator, trimap_pipe, with_source,
)
from conduino_spark.lift import (
    WriterTap, broadcast_env, catch_p, eval_state_p, except_p, exec_state_p,
    exec_writer_p, feedback_pipe, feedback_pipe_either, partition_errors,
    reader_p, run_except_p_, run_state_p, rws_p,
)

__all__ = [n for n in dir() if not n.startswith("_")]
__version__ = "0.1.0"
