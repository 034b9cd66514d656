"""Microbatch replay driver, DDL evolution, checkpoint/resume."""
