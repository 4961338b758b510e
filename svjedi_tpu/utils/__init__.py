"""Cross-cutting utilities: stats, profiling, native-library loading."""
