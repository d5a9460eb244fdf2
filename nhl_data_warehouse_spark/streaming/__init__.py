"""Structured Streaming operators.

The reference's only streaming-shaped behavior is file-arrival
sensing + load-once-per-file (SURVEY.md §2.7); ``file_ingest`` maps it
to the Structured-Streaming file source with ``Trigger.AvailableNow``.
``windows`` adds the event-time operators (tumbling windows,
watermarks, sessionization) a real pipeline needs beyond the
reference.
"""
