from . import autobody, body, flow, rigidmap  # noqa: F401
from .autobody import AutoBody, curvature
from .body import Body, NoBody, SetBody, measure_fill, measure_sdf
from .flow import Flow, FlowCfg, FlowState, cds, mom_step, quick, vanleer
from .rigidmap import RigidMap, setmap
