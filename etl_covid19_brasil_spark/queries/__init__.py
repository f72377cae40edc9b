"""Query modules self-register into the registry via @query on import."""
