#!/usr/bin/env python3
"""Golden generator for the so_* queries (SingleObjects.ipynb pin).

Runs the REFERENCE code at the notebook's exact constructions — the
three module prototypes (cells 3-5), the 3-module centered SuperModule
(cells 7-8, recorded output SM.x2 = 130.3), and the 17-module
fromSuperModule variant (cell 11) — and prints the derived geometry
facts to pin as oracle VALUES. Stubs matplotlib/shapely like
dev/gen_ga_golden.py.
"""
import sys
import types

mpl = types.ModuleType("matplotlib")
plt = types.ModuleType("matplotlib.pyplot")
plt.Polygon = object
mpl.pyplot = plt
sys.modules["matplotlib"] = mpl
sys.modules["matplotlib.pyplot"] = plt
shp = types.ModuleType("shapely")
geo = types.ModuleType("shapely.geometry")
geo.Polygon = object
geo.Point = object
shp.geometry = geo
sys.modules["shapely"] = shp
sys.modules["shapely.geometry"] = geo

sys.path.insert(0, "/root/reference")
from ETL import Sensor, Module, SuperModule, ReadoutBoard  # noqa: E402


def module(name, mh, sx, nx):
    s = Sensor(sx, 22)
    m = Module(mh, 56.50, n_sensor_x=nx, n_sensor_y=2,
               sensor_distance_y=22.5, sensor_distance_x=sx + 0.1)
    m.populate(s)
    m.move_by(-m.x1, -m.y1)
    sax = sum(s.ax1 + s.ax2 for s in m.sensors)
    say = sum(s.ay1 + s.ay2 for s in m.sensors)
    print(f"  ('{name}', {m.x2}, {m.y2}, {len(m.sensors)}, {m.getActiveArea()}, {round(sax,6)}, {round(say,6)}),")
    return m


print("=== so_modules (name, x2, y2, n_sensors, active_area, sax_sum, say_sum) ===")
m_large = module("module_large", 43.10, 42.5, 1)
module("module_new", 44.20, 42.5 / 2 + 0.5, 2)
module("module_small", 42.5 / 2 + 0.5 + 0.6, 42.5 / 2 + 0.5, 1)

print("=== so_supermodules ===")
rb = ReadoutBoard(10, 56.5)
pb = ReadoutBoard(10, 29.5)

# un-moved large module prototype (the SM deep-copies it)
s = Sensor(42.5, 22)
m = Module(43.10, 56.50, n_sensor_x=1, n_sensor_y=2,
           sensor_distance_y=22.5, sensor_distance_x=42.6)
m.populate(s)

sm = SuperModule(m, pb, rb, n_modules=3, orientation='above')
sm.centerModule()
assert sm.x2 == 130.3, sm.x2  # notebook cell 8 recorded output

sm17 = SuperModule.fromSuperModule(sm, n_modules=17, orientation='below')
sm17.move_by(-sm17.x1, -sm17.y1)

for name, o in [("sm_large_3_centered", sm), ("sm_17_below_origin", sm17)]:
    print(f"  ('{name}', {o.n_modules}, {round(o.x1,6)}, {round(o.x2,6)}, {round(o.y1,6)}, {round(o.y2,6)}, "
          f"{round(o.RB.y1,6)}, {round(o.RB.y2,6)}, {round(o.PB.y1,6)}, {round(o.PB.y2,6)}, "
          f"{round(o.VTRX.x,6)}, {round(o.VTRX.y,6)}, {o.getActiveArea()}),")
