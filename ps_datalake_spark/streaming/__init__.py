"""Structured Streaming surface beyond the registered queries: custom
stateful operators (applyInPandasWithState) and streaming job builders."""
