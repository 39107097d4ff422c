from fvc.bench.stages import lsvc_stage_times, profile_trace
