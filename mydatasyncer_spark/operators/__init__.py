"""Relational + pipeline operators, each a thin composition of
DataFrame built-ins so Catalyst owns the physical strategy."""
