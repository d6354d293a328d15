"""Column-level function library (pure expressions, JVM-side)."""
