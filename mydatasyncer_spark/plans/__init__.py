"""Planning/reporting: dry-run execution plans."""
