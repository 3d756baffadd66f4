"""Training-data pipeline operators (dedup / simsearch / text analysis).

Beyond the reference's own operator set: the operations a large-scale
training-data pipeline needs over the documents/embeddings tables.
All are designed scale-first:

- dedup: candidate generation is always a *bucket join* (hash, minhash
  band, simhash prefix), never an O(n²) cross join; only within-bucket
  pairs are scored.
- simsearch: brute-force is broadcast(query) × corpus (embarrassingly
  parallel, no shuffle of the corpus); the LSH variant prunes the
  corpus side by shared buckets first.
- text stats: pure Column expressions.
"""

from rsyslog_spark.datapipe.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    token_minhash_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from rsyslog_spark.datapipe.simsearch import (  # noqa: F401
    brute_force_topk,
    cosine_lsh_topk,
    embedding_dedup_pairs,
    ivf_assign,
    ivf_topk,
    ivf_train_centroids,
)
from rsyslog_spark.datapipe.textstats import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from rsyslog_spark.datapipe.multimodal import (  # noqa: F401
    decode_media_batch,
    frame_sample,
    media_schema,
    resize_images,
)
from rsyslog_spark.datapipe.curation import (  # noqa: F401
    c4_line_filter,
    corpus_mix,
    global_line_dedup,
    pack_sequences,
)
