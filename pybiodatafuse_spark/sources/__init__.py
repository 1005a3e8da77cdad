"""Source scans: pages table, identifier loaders, registry lookups."""
