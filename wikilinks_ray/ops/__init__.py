from .text import (PIIScrubber, TextAnalyzer, analyze_text,  # noqa: F401
                   scrub_pii, token_count_expr)
from .dedup import (  # noqa: F401
    exact_dedup_keep_min,
    ngram_jaccard_pairs,
    minhash_lsh_candidates,
    simhash_signatures,
    simhash_near_dup_pairs_ds,
    embedding_near_dup_pairs,
    decontaminate,
)
from .similarity import (brute_force_top_k, build_ivf_index,  # noqa: F401
                         ivf_top_k, lsh_top_k, train_centroids)
from .curate import curate_documents  # noqa: F401
from .multimodal import (  # noqa: F401
    DecodeAudio,
    DecodeImage,
    FrameSampler,
    ResizeImage,
    decode_pgm,
    encode_pgm,
    encode_wav,
)
from .windows import tumbling_windows, session_windows, sliding_windows  # noqa: F401
