"""Flax model zoo: SASRec, RQ-VAE, TIGER, TIGER-prefix, DenseT5."""

from genrec_tpu.models.sasrec import SASRec  # noqa: F401
from genrec_tpu.models.rqvae import RQVAE  # noqa: F401
from genrec_tpu.models.t5 import T5EncoderDecoder, T5Encoder  # noqa: F401
from genrec_tpu.models.tiger import TIGER  # noqa: F401
from genrec_tpu.models.tiger_prefix import TIGERPrefix  # noqa: F401
from genrec_tpu.models.dense_t5 import DenseT5  # noqa: F401
