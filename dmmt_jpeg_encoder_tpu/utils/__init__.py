"""Cross-cutting utilities: native-code loading, logging."""
