"""Vectorized scalar functions (Arrow pandas UDFs + column-expression helpers)."""
