"""Structured Streaming pipelines (SURVEY.md §2.9 + charter event-time
extension).

The reference's streaming layer is kafka-python glue: earliest-offset
consumer, count-based 2000-row CSV batches, 90 s idle drain
(``batch_writer_consumer.py``). Here that collapses into Structured
Streaming: source → ``from_json`` → conform → checkpointed sink, with
``trigger(availableNow=True)`` reproducing drain-and-stop and
checkpointing upgrading at-least-once to exactly-once. Event-time
watermarks/windows (absent in the reference — its data has no
timestamps) are the engine's extension surface.
"""
