"""Sources & sinks: gazetteer, synthetic pages, polygon fixtures, catalog."""
