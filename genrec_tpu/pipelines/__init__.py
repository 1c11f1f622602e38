"""End-to-end pipelines: the equivalent of each reference `main.py`."""
