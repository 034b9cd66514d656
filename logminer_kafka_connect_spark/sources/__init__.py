"""Sources: change-event schema, deterministic generator, snapshot, redo log."""
