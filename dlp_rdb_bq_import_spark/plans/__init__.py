"""Job orchestration: import pipeline, reid pipeline, SQL surface."""
