from .profiler import trace, device_memory_stats, print_device_memory, Timer
