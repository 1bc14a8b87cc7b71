from fluidnexus_tpu.sim.state import ParticleState, VisualState, make_particle_state  # noqa: F401
from fluidnexus_tpu.sim.pbf import PBFParams, guess_hidden, project_gas_constraints, confirm_guess  # noqa: F401
