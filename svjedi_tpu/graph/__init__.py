"""Variation-graph layer: SV normalization, array-encoded graph, panel."""
