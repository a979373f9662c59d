"""Column-function helpers (JVM-side expressions; no Python UDFs here)."""
