"""Source adapters: REST ingestion, raw JSON lake, watermark state."""
