"""Driver-verified operator implementations (SURVEY.md §2).

Modules register queries into pandas_reporter_spark.registry on import;
registry.load_all() imports them all.
"""
