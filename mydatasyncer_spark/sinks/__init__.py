"""Sinks: transactional apply of diff results to an RDBMS."""
