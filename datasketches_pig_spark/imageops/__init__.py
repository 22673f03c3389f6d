"""Image modality: opaque binary columns + typed metadata, Arrow-batched
decode / feature / perceptual-hash operators (mirrors ``audioops``)."""
