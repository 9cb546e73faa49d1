from ilqr_admm_tpu.models.double_integrator import DoubleIntegrator
from ilqr_admm_tpu.models.car import CarFrontWheel, CarSimple, CarParkingCost
from ilqr_admm_tpu.models.arm import PlanarArm, load_planar_arm_urdf

__all__ = [
    "DoubleIntegrator",
    "CarFrontWheel",
    "CarSimple",
    "CarParkingCost",
    "PlanarArm",
    "load_planar_arm_urdf",
]
