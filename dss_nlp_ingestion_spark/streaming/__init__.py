"""Structured Streaming layer (SURVEY.md §2.12): the reference's
recurring-micro-batch semantics as real streams — tumbling windows,
watermarked TTL dedup, availableNow drain, idempotent foreachBatch
sink."""
