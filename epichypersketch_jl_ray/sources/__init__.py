"""Sources: pruned parquet readers for the testdata tables, activation-table
derivation (normalized rows → per-sequence feature lists), the WARC reader
for scraped-web archives (Common Crawl layout), and the deterministic
webpages fixture generator (input_hint table shape)."""
