"""Source adapters (SURVEY.md §2.1): parsers turning raw per-source
payloads (API JSON, JSONP, HTML listings) into the unified document
schema, plus sink semantics (§2.2). Live HTTP fetching sits behind the
``fetch`` interface; parsers are pure DataFrame transforms testable on
fixtures."""
