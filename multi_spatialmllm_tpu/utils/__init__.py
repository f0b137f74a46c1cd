"""Shared runtime utilities: structured logging, counters, profiling."""
