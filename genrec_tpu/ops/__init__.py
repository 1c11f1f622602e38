"""TPU compute ops: Pallas kernels + jittable functional building blocks."""

from genrec_tpu.ops.attention import multi_head_attention  # noqa: F401
from genrec_tpu.ops.negative_sampling import sample_negatives  # noqa: F401
from genrec_tpu.ops.metrics_ops import strict_ranks, pos_index_exact_match  # noqa: F401
from genrec_tpu.ops.sinkhorn import sinkhorn, kmeans  # noqa: F401
from genrec_tpu.ops.t5_attention import fused_t5_attention  # noqa: F401
