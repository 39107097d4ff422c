from fvc.sim.bola import BolaConfig, simulate_over_trace, load_fcc_trace_csv
