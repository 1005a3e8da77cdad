"""Iterative graph-algorithm plans on the checkpointed superstep engine."""
