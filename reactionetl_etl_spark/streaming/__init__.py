"""Structured Streaming surface.

The reference's incrementality is "re-run the batch over whatever new
files appeared", tracked by directory moves
(/root/reference/file_manager.py:8-11, README.md:15). Structured
Streaming file sources subsume that exactly: checkpointed file
discovery (exactly-once per file), `Trigger.AvailableNow` for the
run-to-completion batch shape, plus real event-time operators
(watermarks, tumbling/session windows) the reference never had.
"""
