"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's only multimodal op is the per-icon feature extractor
(reference feature_extractor.py:15-34: PIL decode -> per-channel mean +
dimensions). Here that becomes Arrow-batched ``mapInPandas`` over a
binary-column DataFrame — the shape a 100 TB media pipeline needs.
"""
