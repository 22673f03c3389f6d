"""Video modality: opaque binary columns + typed metadata, Arrow-batched
frame sampling / per-frame features (mirrors ``audioops``/``imageops``)."""
