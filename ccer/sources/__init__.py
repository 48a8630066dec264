"""Sources & sinks: synthetic page corpus, checkpoint catalog, readers."""
