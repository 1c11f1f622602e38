"""Text-embedding toolchain: BERT item/user/major encoders."""
