"""Genotyping layer: support counting, likelihood model, VCF emission."""
