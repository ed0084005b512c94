"""Sinks: warehouse tables, quarantine/dead-letter, message publisher."""
