"""Evaluation harness: truth-vs-prediction genotype concordance."""
