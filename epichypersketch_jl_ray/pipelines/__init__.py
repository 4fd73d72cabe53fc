"""End-user pipelines. Every public function takes ``sf_dir`` and returns a
ray.data.Dataset / pandas.DataFrame / pyarrow.Table; each is wired into
__ray_entry__.queries() with a DuckDB oracle where SQL can express it."""
