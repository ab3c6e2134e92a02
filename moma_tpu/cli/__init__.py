from moma_tpu.core.cache import enable_compilation_cache

# all CLIs share the persistent XLA compilation cache: effiB0@512 programs
# cold-compile in minutes, warm-start in seconds
enable_compilation_cache()
