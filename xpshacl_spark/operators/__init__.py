"""Operator library: profiling, drift statistics, and scale utilities."""
