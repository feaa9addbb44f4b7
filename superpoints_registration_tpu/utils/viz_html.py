"""Interactive registration viewer: standalone HTML + WebGL, zero deps.

TPU-era counterpart of the reference's interactive VTK visualizer
(src/cvhelpers/visualization/visualizer.py + src/utils/viz.py:11): instead of
an X11/VTK window (useless on a headless TPU host), exports a single
self-contained HTML file — point clouds embedded as base64 Float32Arrays,
rendered with raw WebGL, orbit/zoom/pan with the mouse, panel toggles with
keys 1-4. Open locally in any browser.

    from superpoints_registration_tpu.utils.viz_html import export_registration_html
    export_registration_html('reg.html', src, tgt, pose_pred, pose_gt=pose_gt)
"""
from __future__ import annotations

import base64
import json

import numpy as np

from ..ops import lie_np

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>registration viewer</title>
<style>
 body { margin:0; background:#111; color:#ddd; font:13px monospace; }
 #info { position:absolute; top:8px; left:10px; pointer-events:none; }
 canvas { display:block; }
</style></head>
<body>
<div id="info">drag: rotate &nbsp; wheel: zoom &nbsp; shift-drag: pan<br>
 keys: %KEYHELP%</div>
<canvas id="c"></canvas>
<script>
const CLOUDS = %CLOUDS%;
const canvas = document.getElementById('c');
const gl = canvas.getContext('webgl');
const vsrc = `attribute vec3 p; uniform mat4 mvp; uniform float psize;
 void main(){ gl_Position = mvp*vec4(p,1.0); gl_PointSize = psize; }`;
const fsrc = `precision mediump float; uniform vec3 color; uniform float alpha;
 void main(){ gl_FragColor = vec4(color, alpha); }`;
function shader(t,s){const sh=gl.createShader(t);gl.shaderSource(sh,s);
 gl.compileShader(sh);return sh;}
const prog = gl.createProgram();
gl.attachShader(prog, shader(gl.VERTEX_SHADER, vsrc));
gl.attachShader(prog, shader(gl.FRAGMENT_SHADER, fsrc));
gl.linkProgram(prog); gl.useProgram(prog);
const locP = gl.getAttribLocation(prog,'p');
const locMVP = gl.getUniformLocation(prog,'mvp');
const locC = gl.getUniformLocation(prog,'color');
const locA = gl.getUniformLocation(prog,'alpha');
const locS = gl.getUniformLocation(prog,'psize');
function b64f32(b){const raw=atob(b);const a=new Uint8Array(raw.length);
 for(let i=0;i<raw.length;i++)a[i]=raw.charCodeAt(i);
 return new Float32Array(a.buffer);}
let center=[0,0,0], n=0;
for (const c of CLOUDS){
  c.data = b64f32(c.b64); delete c.b64;
  c.buf = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, c.buf);
  gl.bufferData(gl.ARRAY_BUFFER, c.data, gl.STATIC_DRAW);
  c.n = c.data.length/3; c.on = true;
  for(let i=0;i<c.data.length;i+=3){center[0]+=c.data[i];
   center[1]+=c.data[i+1];center[2]+=c.data[i+2];}
  n += c.n;
}
center = center.map(v=>v/Math.max(n,1));
let rotX=0.4, rotY=0.6, dist=4.0, panX=0, panY=0;
function mat(){
 const a=Math.cos(rotX),b=Math.sin(rotX),c=Math.cos(rotY),d=Math.sin(rotY);
 const asp=canvas.width/canvas.height, f=1.6, near=0.01, far=100;
 // model: translate(-center) -> rotY -> rotX -> translate(pan, -dist) -> persp
 const m=[c,d*b,d*a,0, 0,a,-b,0, -d,c*b,c*a,0, 0,0,0,1];
 const t=[1,0,0,0, 0,1,0,0, 0,0,1,0,
          -center[0],-center[1],-center[2],1];
 const v=[1,0,0,0, 0,1,0,0, 0,0,1,0, panX,panY,-dist,1];
 const p=[f/asp,0,0,0, 0,f,0,0, 0,0,(far+near)/(near-far),-1,
          0,0,2*far*near/(near-far),0];
 return mul(p, mul(v, mul(m, t)));
}
function mul(A,B){const o=new Array(16).fill(0);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++)for(let k=0;k<4;k++)
  o[j*4+i]+=A[k*4+i]*B[j*4+k]; return o;}
function draw(){
 canvas.width=innerWidth; canvas.height=innerHeight;
 gl.viewport(0,0,canvas.width,canvas.height);
 gl.clearColor(0.07,0.07,0.07,1); gl.clear(gl.COLOR_BUFFER_BIT);
 gl.enable(gl.BLEND); gl.blendFunc(gl.SRC_ALPHA, gl.ONE_MINUS_SRC_ALPHA);
 const mvp = mat();
 for (const c of CLOUDS){ if(!c.on) continue;
  gl.bindBuffer(gl.ARRAY_BUFFER, c.buf);
  gl.enableVertexAttribArray(locP);
  gl.vertexAttribPointer(locP,3,gl.FLOAT,false,0,0);
  gl.uniformMatrix4fv(locMVP,false,new Float32Array(mvp));
  gl.uniform3fv(locC,c.color); gl.uniform1f(locA,c.alpha);
  gl.uniform1f(locS,c.size);
  gl.drawArrays(gl.POINTS,0,c.n);
 }
}
let drag=false, pan=false, lx=0, ly=0;
canvas.onmousedown=e=>{drag=true;pan=e.shiftKey;lx=e.clientX;ly=e.clientY;};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
 const dx=e.clientX-lx, dy=e.clientY-ly; lx=e.clientX; ly=e.clientY;
 if(pan){panX+=dx*0.003*dist;panY-=dy*0.003*dist;}
 else{rotY+=dx*0.008;rotX+=dy*0.008;}
 draw();};
canvas.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);draw();e.preventDefault();};
window.onkeydown=e=>{const i=parseInt(e.key)-1;
 if(i>=0&&i<CLOUDS.length){CLOUDS[i].on=!CLOUDS[i].on;draw();}};
window.onresize=draw;
draw();
</script></body></html>
"""


def _cloud(name, pts, color, alpha=0.85, size=2.0):
    pts = np.ascontiguousarray(np.asarray(pts, np.float32))
    return {
        'name': name,
        'b64': base64.b64encode(pts.tobytes()).decode('ascii'),
        'color': list(color),
        'alpha': alpha,
        'size': size,
    }


def export_registration_html(path, src, tgt, pose_pred, pose_gt=None,
                             max_points=60000, rng=None):
    """Write a standalone interactive viewer for one registration result.

    Panels (toggle with keys 1..4): [1] src (red), [2] tgt (green),
    [3] src warped by pose_pred (cyan), [4] src warped by pose_gt (yellow).
    """
    rng = rng or np.random.default_rng(0)

    def cap(p):
        p = np.asarray(p, np.float32)
        if len(p) > max_points:
            p = p[rng.choice(len(p), max_points, replace=False)]
        return p

    src, tgt = cap(src), cap(tgt)
    clouds = [
        _cloud('src', src, (0.9, 0.3, 0.3)),
        _cloud('tgt', tgt, (0.3, 0.9, 0.4)),
        _cloud('src@pred', cap(lie_np.se3_transform(
            np.asarray(pose_pred, np.float32), src)), (0.3, 0.8, 0.95)),
    ]
    keyhelp = '1: src  2: tgt  3: src@pred'
    if pose_gt is not None:
        clouds.append(_cloud('src@gt', cap(lie_np.se3_transform(
            np.asarray(pose_gt, np.float32), src)), (0.95, 0.85, 0.3),
            alpha=0.6))
        keyhelp += '  4: src@gt'
    html = (_TEMPLATE
            .replace('%CLOUDS%', json.dumps(clouds))
            .replace('%KEYHELP%', keyhelp))
    with open(path, 'w') as f:
        f.write(html)
    return path
