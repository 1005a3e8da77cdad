"""Export sinks (edge-list / TSV / JSON) and provenance metadata."""
