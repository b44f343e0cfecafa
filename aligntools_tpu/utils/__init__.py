"""Aux subsystems: profiling/observability, checkpoint/resume."""
