"""Sources & sinks (SURVEY.md §2.1) and the imperative ingest stages
(§2.11 UD1-UD3) that feed the declarative engine."""
