"""Data layer: HDF5/NPY contracts, ETL, synthetic generators, batching."""

from genrec_tpu.data import contracts, synthetic, tiger_tokens, datasets  # noqa: F401
