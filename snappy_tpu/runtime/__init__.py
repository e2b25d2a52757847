"""L2 runtime: block planning, padded batching, device dispatch, framed
stream assembly (SURVEY.md §7.1)."""
