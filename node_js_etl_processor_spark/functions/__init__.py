"""Column-expression helper library (all JVM-side, Catalyst-visible)."""
