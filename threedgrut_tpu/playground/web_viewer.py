"""Dependency-free interactive web GUI for trained scenes.

Reference role: the playground GUIs (threedgrut_playground/ps_gui.py —
polyscope/ImGui, 1076 lines — and viser_gui.py). Neither polyscope nor viser
is required here: this is a self-contained stdlib HTTP server + HTML/JS
client covering the same control surface:

  - quick presets (Fast / Balanced / High Quality, ps_gui.py:246-279)
  - render settings: channel (color/density/depth), trace vs hybrid mode,
    camera model (pinhole/fisheye), FOV, gamma, max bounces, SPP, tonemap,
    denoiser toggle (ps_gui.py:281-392, 610-704)
  - depth of field: aperture + focus distance (ps_gui.py:673-704)
  - material editor: per-material kind/base-color/metallic/roughness/
    ior/emissive (ps_gui.py:748-833)
  - primitive editor: visibility, translate/rotate/scale, material assign,
    duplicate/remove (ps_gui.py:706-1001)
  - camera trajectory: add/clear keyframes, save/load JSON, render video
    (ps_gui.py:467-547)

Config edits retrace at most once per distinct static config (the Engine jit
caches per config); material/primitive edits are data-only and never retrace.

Usage:  viewer = WebViewer(engine, scene=scene_graph); viewer.serve(8080)
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>threedgrut_tpu playground</title>
<style>
body{margin:0;background:#111;color:#eee;font-family:monospace;display:flex}
#panel{width:300px;padding:10px;overflow-y:auto;height:100vh;
  background:#1a1a1a;font-size:12px}
#panel h3{margin:10px 0 4px;color:#8cf;cursor:pointer}
#panel label{display:block;margin:3px 0}
#panel input[type=range]{width:120px;vertical-align:middle}
#panel select,#panel input[type=number]{background:#222;color:#eee;
  border:1px solid #444;width:70px}
#panel button{background:#333;color:#eee;border:1px solid #555;margin:2px;
  cursor:pointer}
#view{align-self:flex-start}
#hud{position:fixed;top:8px;right:8px;color:#8f8}
.sec{display:block}
</style></head>
<body>
<div id="panel"></div>
<img id="view" width="%(w)d" height="%(h)d" draggable="false">
<div id="hud">drag orbit | wheel zoom</div>
<script>
let S=null;  // mirrored server state
let yaw=0.6,pitch=0.4,radius=4.0,drag=false,lx=0,ly=0,pending=false,dirty=false;
const img=document.getElementById('view');
function refresh(){
  if(pending){dirty=true;return} pending=true;
  fetch(`/render?yaw=${yaw}&pitch=${pitch}&radius=${radius}`)
    .then(r=>r.blob()).then(b=>{img.src=URL.createObjectURL(b);
      pending=false; if(dirty){dirty=false;refresh();}});
}
function post(path,body){
  return fetch(path,{method:'POST',body:JSON.stringify(body)})
    .then(r=>r.json()).then(s=>{S=s;buildPanel();refresh();});
}
function cfg(k,v){post('/config',{[k]:v});}
function slider(label,value,min,max,step,oninput){
  return `<label>${label} <input type=range min=${min} max=${max} `+
    `step=${step} value=${value} onchange="(${oninput})(this.value)">`+
    `<span>${value}</span></label>`;
}
function buildPanel(){
  const c=S.config;let h='';
  h+='<h3>Quick Settings</h3><div class=sec>';
  h+='<button onclick="post(\\'/preset\\',{name:\\'fast\\'})">Fast</button>';
  h+='<button onclick="post(\\'/preset\\',{name:\\'balanced\\'})">Balanced</button>';
  h+='<button onclick="post(\\'/preset\\',{name:\\'high\\'})">High Quality</button></div>';
  h+='<h3>Render</h3><div class=sec>';
  h+=`<label>Channel <select onchange="cfg('channel',this.value)">`+
     ['color','density','depth'].map(x=>`<option ${S.channel==x?'selected':''}>${x}</option>`).join('')+'</select></label>';
  h+=`<label>Mode <select onchange="cfg('mode',this.value)">`+
     ['trace','hybrid','raster'].map(x=>`<option ${S.mode==x?'selected':''}>${x}</option>`).join('')+'</select></label>';
  h+=`<label>Camera <select onchange="cfg('camera',this.value)">`+
     ['pinhole','fisheye'].map(x=>`<option ${S.camera==x?'selected':''}>${x}</option>`).join('')+'</select></label>';
  h+=slider('FOV°',S.fov_deg,20,120,1,'v=>cfg(\\'fov_deg\\',+v)');
  h+=slider('Gamma',c.gamma,0.5,3,0.05,'v=>cfg(\\'gamma\\',+v)');
  h+=slider('Bounces',c.max_bounces,1,8,1,'v=>cfg(\\'max_bounces\\',+v)');
  h+=slider('SPP',c.spp,1,16,1,'v=>cfg(\\'spp\\',+v)');
  h+=`<label><input type=checkbox ${c.tonemap?'checked':''} `+
     `onchange="cfg('tonemap',this.checked)">Filmic tonemap</label>`;
  h+=`<label><input type=checkbox ${c.denoise?'checked':''} `+
     `onchange="cfg('denoise',this.checked)">Denoiser</label>`;
  h+=`<label>Filter <select onchange="cfg('denoiser',this.value)">`+
     ['atrous','bilateral'].map(x=>`<option ${c.denoiser==x?'selected':''}>${x}</option>`).join('')+'</select></label></div>';
  h+='<h3>Depth of Field</h3><div class=sec>';
  h+=`<label><input type=checkbox ${c.use_dof?'checked':''} `+
     `onchange="cfg('use_dof',this.checked)">Enable</label>`;
  h+=slider('Aperture',c.aperture,0,0.2,0.002,'v=>cfg(\\'aperture\\',+v)');
  h+=slider('Focus z',c.focus_z,0.2,10,0.1,'v=>cfg(\\'focus_z\\',+v)')+'</div>';
  h+='<h3>Materials</h3><div class=sec>';
  S.scene.materials.forEach((m,i)=>{
    h+=`<details><summary>#${i} ${['diffuse','mirror','glass','pbr'][m.kind]}`+
       `${m.has_texture?' [tex]':''}</summary>`;
    h+=`<label>Kind <select onchange="post('/material',{id:${i},kind:this.selectedIndex})">`+
       ['diffuse','mirror','glass','pbr'].map((x,k)=>`<option ${m.kind==k?'selected':''}>${x}</option>`).join('')+'</select></label>';
    h+=`<label>Color <input type=color value="${rgbhex(m.base_color)}" `+
       `onchange="post('/material',{id:${i},base_color:hexrgb(this.value)})"></label>`;
    h+=slider('Metallic',m.metallic,0,1,0.02,`v=>post('/material',{id:${i},metallic:+v})`);
    h+=slider('Roughness',m.roughness,0,1,0.02,`v=>post('/material',{id:${i},roughness:+v})`);
    h+=slider('IOR',m.ior,1,2.5,0.02,`v=>post('/material',{id:${i},ior:+v})`);
    h+=`</details>`;});
  h+='</div><h3>Primitives</h3><div class=sec>';
  for(const [n,p] of Object.entries(S.scene.primitives)){
    h+=`<details><summary>${n} (${p.num_faces}f)</summary>`;
    h+=`<label><input type=checkbox ${p.visible?'checked':''} `+
       `onchange="post('/primitive',{name:'${n}',visible:this.checked})">visible</label>`;
    ['x','y','z'].forEach((ax,k)=>{
      h+=slider('t'+ax,p.translation[k],-3,3,0.05,
        `v=>{let t=${JSON.stringify(p.translation)};t[${k}]=+v;`+
        `post('/primitive',{name:'${n}',translation:t})}`);});
    h+=slider('rot z',p.rotation_euler[2],-3.14,3.14,0.05,
      `v=>{let r=${JSON.stringify(p.rotation_euler)};r[2]=+v;`+
      `post('/primitive',{name:'${n}',rotation_euler:r})}`);
    h+=slider('scale',p.scale,0.1,4,0.05,
      `v=>post('/primitive',{name:'${n}',scale:+v})`);
    h+=`<label>Material <input type=number value="${p.material_id==null?-1:p.material_id}" `+
       `onchange="post('/primitive',{name:'${n}',material_id:+this.value<0?null:+this.value})"></label>`;
    h+=`<button onclick="post('/primitive',{name:'${n}',op:'duplicate'})">duplicate</button>`;
    h+=`<button onclick="post('/primitive',{name:'${n}',op:'remove'})">remove</button>`;
    h+=`</details>`;}
  if(S.has_training){
    h+='<h3>Training</h3><div class=sec id=trainsec>';
    h+='<div id=trainline>waiting for log points...</div>';
    h+='<canvas id=spark width=280 height=80 style="background:#222"></canvas>';
    h+='<label><input type=checkbox id=livechk checked>live view (5s)</label>';
    h+='</div>';
  }
  h+='</div><h3>Trajectory Video</h3><div class=sec>';
  h+=`<button onclick="post('/traj',{op:'add',yaw:yaw,pitch:pitch,radius:radius})">Add Camera</button>`;
  h+=`<button onclick="post('/traj',{op:'clear'})">Reset</button>`;
  h+=`<button onclick="post('/traj',{op:'render'})">Render Video</button>`;
  h+=`<div>${S.trajectory.length} cameras`+
     `${S.video_status?' | '+S.video_status:''}</div>`;
  h+=`<button onclick="post('/traj',{op:'save'})">Save</button>`;
  h+=`<button onclick="post('/traj',{op:'load'})">Load</button></div>`;
  document.getElementById('panel').innerHTML=h;
}
function rgbhex(c){return '#'+c.map(x=>Math.round(x*255)
  .toString(16).padStart(2,'0')).join('');}
function hexrgb(s){return [1,3,5].map(i=>parseInt(s.substr(i,2),16)/255);}
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  yaw+=(e.clientX-lx)*0.01;pitch+=(e.clientY-ly)*0.01;
  pitch=Math.max(-1.5,Math.min(1.5,pitch));lx=e.clientX;ly=e.clientY;
  refresh();};
window.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001);refresh();};
fetch('/state').then(r=>r.json()).then(s=>{S=s;buildPanel();refresh();
  if(S.has_training)setInterval(pollTrain,2000);});
function pollTrain(){
  fetch('/train_status').then(r=>r.json()).then(t=>{
    const h=t.history||[];if(!h.length)return;
    const last=h[h.length-1];
    const el=document.getElementById('trainline');
    if(el)el.innerHTML=`step ${last.step} | loss ${last.loss.toFixed(4)}`+
      ` | psnr ${last.psnr.toFixed(2)} dB<br>particles ${last.particles}`+
      ` | ${last.it_s.toFixed(1)} it/s`;
    const cv=document.getElementById('spark');
    if(cv){const g=cv.getContext('2d');g.clearRect(0,0,280,80);
      const ps=h.map(x=>x.psnr),lo=Math.min(...ps),hi=Math.max(...ps)+1e-6;
      g.strokeStyle='#8f8';g.beginPath();
      ps.forEach((p,i)=>{const x=i*280/Math.max(1,ps.length-1),
        y=76-72*(p-lo)/(hi-lo);i?g.lineTo(x,y):g.moveTo(x,y);});
      g.stroke();g.fillStyle='#8f8';g.font='10px monospace';
      g.fillText(hi.toFixed(1),2,10);g.fillText(lo.toFixed(1),2,78);}
    const chk=document.getElementById('livechk');
    if(chk&&chk.checked&&(!window._lastLive
        ||(Date.now()-window._lastLive)>5000)){
      window._lastLive=Date.now();refresh();}
  }).catch(()=>{});
}
</script></body></html>
"""

_PRESETS = {
    # (spp, max_bounces, denoise) — ps_gui.py:251-277 Fast/Balanced/HQ.
    "fast": dict(spp=1, max_bounces=2, denoise=False),
    "balanced": dict(spp=2, max_bounces=4, denoise=False),
    "high": dict(spp=4, max_bounces=6, denoise=True),
}


def _raster_jits():
    """Jitted helpers for the raster fast-preview mode, created once
    (jax.jit caches per-wrapper; re-wrapping per frame would recompile)."""
    global _RASTER_JITS
    if _RASTER_JITS is None:
        import jax
        from threedgrut_tpu.cameras import pose_from_matrix
        from threedgrut_tpu.render import infer

        def _refresh(P, cam, T, res, cap, n_c):
            return infer.refresh(*P, cam, pose_from_matrix(T), res, cap,
                                 n_c, sh_degree=3, T_to_world=T,
                                 visibility_threshold=1.0 / 255.0)

        def _compact(scene, cam, T, res, cap_c, aux):
            return infer.render_compact(scene, cam, pose_from_matrix(T),
                                        res, cap_c, sh_degree=3,
                                        T_to_world=T, aux_outputs=aux)

        _RASTER_JITS = (jax.jit(_refresh, static_argnums=(3, 4, 5)),
                        jax.jit(_compact, static_argnums=(3, 4, 5)))
    return _RASTER_JITS


_RASTER_JITS = None


class WebViewer:
    def __init__(self, engine, resolution: Tuple[int, int] = (400, 400),
                 target=(0.0, 0.0, 0.0), fov_deg: float = 60.0,
                 scene=None, traj_path: str = "trajectory.json",
                 video_path: str = "trajectory.mp4", status_fn=None):
        self.engine = engine
        # Optional live-training status provider (gui.TrainingGUI): a
        # callable returning a dict with a `history` list; enables the
        # Training panel + /train_status endpoint.
        self.status_fn = status_fn
        self.scene = scene          # optional SceneGraph
        self.resolution = resolution
        self.target = np.asarray(target, np.float32)
        self.fov_deg = float(fov_deg)
        self.camera_kind = "pinhole"
        self.channel = "color"
        self.mode = "trace"
        self.trajectory = []        # list of dicts (yaw, pitch, radius)
        self.traj_path = traj_path
        self.video_path = video_path
        self.video_status = ""
        self._lock = threading.Lock()
        self._raster_cache = None   # CompactScene + refresh key (raster mode)
        self._raster_caps = None    # [isect_cap, n_compact, compact_cap]
        self._sync_scene()

    # -- scene edits feed the engine's stacked buffers ----------------------
    def _sync_scene(self):
        if self.scene is not None:
            self.engine.mesh = self.scene.mesh()
            self.engine.materials = self.scene.materials()

    def _camera(self):
        import jax.numpy as jnp
        from threedgrut_tpu.cameras import FisheyeCamera, PinholeCamera
        w, h = self.resolution
        f = 0.5 * w / np.tan(0.5 * np.radians(self.fov_deg))
        if self.camera_kind == "fisheye":
            return FisheyeCamera(
                focal=jnp.asarray([f, f], jnp.float32),
                principal=jnp.asarray([w / 2, h / 2], jnp.float32),
                radial=jnp.zeros(4),
                max_angle=jnp.asarray(np.radians(
                    0.75 * self.fov_deg), jnp.float32))
        return PinholeCamera(
            focal=jnp.asarray([f, f], jnp.float32),
            principal=jnp.asarray([w / 2, h / 2], jnp.float32),
            radial=jnp.zeros(6), tangential=jnp.zeros(2),
            thin_prism=jnp.zeros(4))

    def _pose(self, yaw, pitch, radius):
        import jax.numpy as jnp
        from threedgrut_tpu.datasets.dataset_synthetic import look_at
        eye = self.target + radius * np.array([
            np.cos(pitch) * np.cos(yaw), np.cos(pitch) * np.sin(yaw),
            np.sin(pitch)], np.float32)
        return jnp.asarray(look_at(eye, self.target,
                                   np.array([0, 0, 1], np.float32)))

    def render_frame(self, yaw: float, pitch: float,
                     radius: float) -> np.ndarray:
        T = self._pose(yaw, pitch, radius)
        with self._lock:
            if self.mode == "raster":
                out = self._render_raster(yaw, pitch, radius, T)
            else:
                fn = (self.engine.render_hybrid_jit
                      if self.mode == "hybrid" else self.engine.render)
                out = fn(self._camera(), T, self.resolution)
        if self.channel == "density":
            op = np.asarray(out["opacity"])
            return np.repeat(np.clip(op, 0, 1)[..., None], 3, -1)
        if self.channel == "depth":
            from threedgrut_tpu.utils.writer import jet_colormap
            d = np.asarray(out["depth"])
            inv = np.where(d > 1e-6, 1.0 / np.maximum(d, 1e-6), 0.0)
            return jet_colormap(inv / max(1e-6, float(inv.max())))
        return np.clip(np.asarray(out["rgb"]), 0.0, 1.0)

    # -- raster fast-preview (frame-coherent inference) ---------------------
    def _render_raster(self, yaw, pitch, radius, T):
        """Mode 'raster': pure-Gaussians rasterized preview through the
        frame-coherent inference path (render/infer.py) — a REFRESH frame
        (exact + contributed-weight census + compaction) whenever the
        camera moved > ~7 deg or every 8 frames; compacted frames between.
        The interactive analogue of the reference's BVH refit
        amortization. Meshes are ignored (use trace/hybrid for those).
        Capacities grow-and-retrace on overflow like the trainer's."""
        P = self.engine.gaussians
        n = int(P[0].shape[0])
        if self._raster_caps is None:
            cap = min(1 << 22, max(1 << 16, -(-48 * n // 256) * 256))
            n_c = min(n, max(256, -(-(n // 2) // 256) * 256))
            self._raster_caps = [cap, n_c, -(-(cap // 2) // 256) * 256]
        cam = self._camera()
        aux = self.channel in ("density", "depth")
        key = (yaw, pitch, radius)
        refresh_jit, compact_jit = _raster_jits()

        def angdelta(a, b):
            return (abs(a[0] - b[0]) + abs(a[1] - b[1])
                    + abs(a[2] - b[2]) / max(b[2], 1e-3))

        out = None
        for _ in range(4):
            cap, n_c, cap_c = self._raster_caps
            cache = self._raster_cache
            need = (cache is None or cache["frames"] >= 8
                    or angdelta(key, cache["key"]) > 0.12)
            if need:
                out, ovf, scene = refresh_jit(P, cam, T, self.resolution,
                                              cap, n_c)
                if bool(ovf):
                    self._raster_caps[0] = min(cap * 2, 1 << 23)
                    self._raster_caps[2] = min(cap_c * 2, 1 << 23)
                    self._raster_cache = None
                    continue
                if bool(scene.overflow):
                    self._raster_caps[1] = min(n, n_c * 2)
                    self._raster_cache = None
                    continue
                self._raster_cache = dict(scene=scene, key=key, frames=0)
            else:
                scene = cache["scene"]
                out, covf = compact_jit(scene, cam, T, self.resolution,
                                        cap_c, aux)
                if bool(covf):
                    self._raster_caps[2] = min(cap_c * 2, 1 << 23)
                    continue
                cache["frames"] += 1
                cache["key"] = key
            break
        return dict(rgb=out.rgb, opacity=out.opacity, depth=out.depth)

    def _encode_jpeg(self, rgb: np.ndarray) -> bytes:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            buf, format="JPEG", quality=90)
        return buf.getvalue()

    # -- state & edit operations -------------------------------------------
    def describe(self) -> dict:
        import dataclasses
        return dict(
            config=dataclasses.asdict(self.engine.cfg),
            fov_deg=self.fov_deg, camera=self.camera_kind,
            channel=self.channel, mode=self.mode,
            resolution=self.resolution,
            scene=(self.scene.describe() if self.scene is not None
                   else dict(primitives={}, materials=[])),
            trajectory=self.trajectory,
            video_status=self.video_status,
            has_training=self.status_fn is not None)

    def apply_config(self, body: dict) -> None:
        import dataclasses
        with self._lock:
            for k, v in body.items():
                if k == "fov_deg":
                    self.fov_deg = float(v)
                elif k == "camera":
                    self.camera_kind = str(v)
                elif k == "channel":
                    self.channel = str(v)
                elif k == "mode":
                    self.mode = str(v)
                elif k in {f.name for f in
                           dataclasses.fields(type(self.engine.cfg))}:
                    cur = getattr(self.engine.cfg, k)
                    setattr(self.engine.cfg, k, type(cur)(v))
                else:
                    raise KeyError(k)

    def apply_material(self, body: dict) -> None:
        mid = int(body.pop("id"))
        with self._lock:
            self.scene.set_material(mid, **body)
            self._sync_scene()

    def apply_primitive(self, body: dict) -> None:
        name = body.pop("name")
        op = body.pop("op", None)
        with self._lock:
            if op == "duplicate":
                self.scene.duplicate(name)
            elif op == "remove":
                self.scene.remove(name)
            elif body:
                self.scene.update(name, **body)
            self._sync_scene()

    def apply_traj(self, body: dict) -> None:
        op = body.get("op")
        if op == "add":
            self.trajectory.append(dict(
                yaw=float(body["yaw"]), pitch=float(body["pitch"]),
                radius=float(body["radius"])))
        elif op == "clear":
            self.trajectory = []
        elif op == "save":
            with open(self.traj_path, "w") as f:
                json.dump(self.trajectory, f)
            self.video_status = f"saved {self.traj_path}"
        elif op == "load":
            with open(self.traj_path) as f:
                self.trajectory = json.load(f)
            self.video_status = f"loaded {len(self.trajectory)} cams"
        elif op == "render":
            if len(self.trajectory) < 2:
                self.video_status = "need >= 2 cameras"
                return
            t = threading.Thread(target=self._render_video, daemon=True)
            t.start()
            self.video_status = "rendering..."

    def _render_video(self, n_frames: int = 120, fps: int = 30):
        from threedgrut_tpu.playground.video import (keyframe_trajectory,
                                                     render_video)
        kf = [np.asarray(self._pose(c["yaw"], c["pitch"], c["radius"]))
              for c in self.trajectory]
        traj = keyframe_trajectory(kf, n_frames, target=tuple(self.target))
        with self._lock:
            path = render_video(self.engine, self._camera(), traj,
                                self.resolution, self.video_path, fps=fps,
                                hybrid=self.mode == "hybrid")
        self.video_status = f"wrote {path}"

    # -- HTTP ---------------------------------------------------------------
    def make_handler(viewer):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    w, h = viewer.resolution
                    body = (_PAGE % {"w": w, "h": h}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/render":
                    q = parse_qs(u.query)

                    def val(k, dflt):
                        return float(q.get(k, [dflt])[0])
                    rgb = viewer.render_frame(
                        val("yaw", 0.6), val("pitch", 0.4),
                        val("radius", 4.0))
                    body = viewer._encode_jpeg(rgb)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path in ("/state", "/info"):
                    self._json(viewer.describe())
                elif u.path == "/train_status":
                    if viewer.status_fn is None:
                        self._json({"error": "not training"}, 404)
                    else:
                        self._json(viewer.status_fn())
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                u = urlparse(self.path)
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                try:
                    if u.path == "/config":
                        viewer.apply_config(body)
                    elif u.path == "/preset":
                        viewer.apply_config(_PRESETS[body["name"]])
                    elif u.path == "/material":
                        viewer.apply_material(body)
                    elif u.path == "/primitive":
                        viewer.apply_primitive(body)
                    elif u.path == "/traj":
                        viewer.apply_traj(body)
                    else:
                        self._json({"error": "unknown"}, 404)
                        return
                    self._json(viewer.describe())
                except Exception as e:  # surface edit errors to the client
                    self._json({"error": str(e)}, 400)
        return Handler

    def serve(self, port: int = 8080, blocking: bool = True):
        server = ThreadingHTTPServer(("0.0.0.0", port), self.make_handler())
        print(f"viewer at http://localhost:{port}/", flush=True)
        if blocking:
            server.serve_forever()
        else:
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
        return server
