"""Source abstractions — the datastore_driver plane of the reference
(SURVEY §2.1): batch snapshot scans, CDC subscriptions, and the composite
snapshot+subscribe query, plus the mock store used by tests."""
