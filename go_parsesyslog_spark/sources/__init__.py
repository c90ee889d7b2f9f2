"""Sources: transcript table generator + testdata loaders."""
