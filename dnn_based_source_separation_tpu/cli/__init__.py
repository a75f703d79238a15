"""L7: command-line entry points backing the egs/ recipe tree."""
