"""Model and render-pipe registries.

Parity target: FluidDynamics/helpers/helper_gaussian.py (get_model:4-26) and
helpers/helper_pipe.py (get_render_pipe:1-48). The reference returns torch
GaussianModel classes and CUDA rasterizer bindings; here the registry maps the
same names onto this framework's constructs so reference configs
("model": "gm_dynamics", "rd_pipe": "render_dynamics") resolve unchanged.
"""
from __future__ import annotations

from typing import Any, Callable, Dict


def get_model(name: str) -> Dict[str, Any]:
    """Resolve a reference model name to the framework pieces implementing it."""
    from fluidnexus_tpu.sim import pbf, state
    from fluidnexus_tpu.splat import background, dynamics

    registry = {
        # hidden+visual particles over a frozen background (gm_dynamics.py)
        "gm_dynamics": dict(kind="dynamics", state=state.ParticleState,
                            visual=state.VisualState, solver=pbf, module=dynamics,
                            has_background=True, channels=1),
        # fluid-only grayscale variant (gm_fluid.py)
        "gm_fluid": dict(kind="dynamics", state=state.ParticleState,
                         visual=state.VisualState, solver=pbf, module=dynamics,
                         has_background=False, channels=1),
        # static 3DGS with densification (gm_background.py)
        "gm_background": dict(kind="background", model=background.BackgroundModel,
                              params=background.BackgroundParams, module=background,
                              channels=3),
        # vanilla 3DGS with spherical-harmonics color (gaussian_model.py
        # registry entry gm_gs): color field = SH DC coefficients, per-view
        # colors via render.render_gs_sh / ops.sh (forward.cu:20-68)
        "gm_gs": dict(kind="background", model=background.BackgroundModel,
                      params=background.BackgroundParams, module=background,
                      channels=3, sh=True),
    }
    if name not in registry:
        raise ValueError(f"unknown model {name!r}; known: {sorted(registry)}")
    return registry[name]


def get_render_pipe(name: str) -> Callable:
    """Resolve a reference pipe name to the render function."""
    from fluidnexus_tpu.splat import render

    registry = {
        "render_dynamics": render.render_particles_with_background,   # pipe_dynamics.py:8
        "render_fluid": render.render_particles_with_background,      # pipe_fluid.py:8 (bg=None)
        "render_background": render.render_particles_with_background,  # pipe_background.py:9
        "render": render.render_particles_with_background,            # pipe.py:14
        "v2": render.render_particles_with_background,
    }
    if name not in registry:
        raise ValueError(f"unknown render pipe {name!r}; known: {sorted(registry)}")
    return registry[name]
