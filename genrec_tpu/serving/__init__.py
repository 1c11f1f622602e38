"""Serving surface: hybrid recommender, model-backed retrieval, FastAPI app."""
